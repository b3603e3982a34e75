"""URL canonicalization and URL-level dedup for web corpora.

Web-crawl pipelines dedup by canonical URL before any content-level
pass: the same page is fetched as ``http://`` and ``https://``, with
and without ``www.``, with tracking parameters appended, with session
fragments — all one document. Canonicalization collapses those variants
so the (cheap, exact) URL dedup removes refetches before the expensive
content dedup runs.

Scale design: :func:`canonicalize_url` is a single codegen projection —
``parse_url`` component extraction plus a fixed ``regexp_replace``
chain, no Python, no higher-order functions unless the opt-in query
re-sorting is enabled (per-row JVM interpreted lambda, documented
cost). :func:`dedup_urls` is exact dedup on the canonical key: one hash
aggregate with map-side combine, same shape as ``dedup_exact``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["canonicalize_url", "dedup_urls", "filter_urls",
           "NON_TEXT_EXTENSIONS", "TRACKING_PARAMS"]

#: Query parameters that identify a campaign/click, not a resource.
TRACKING_PARAMS = (
    "utm_[^&=]*",
    "fbclid",
    "gclid",
    "gclsrc",
    "dclid",
    "msclkid",
    "mc_cid",
    "mc_eid",
    "igshid",
    "ref",
    "ref_src",
    "spm",
)


def canonicalize_url(
    url: Column | str,
    strip_www: bool = True,
    tracking_params: Sequence[str] = TRACKING_PARAMS,
    sort_query: bool = False,
) -> Column:
    """Canonical form of a URL, as one codegen expression.

    Normalizations applied:

    * scheme and host lowercased; ``www.`` prefix dropped (opt-out);
    * default ports ``:80`` (http) / ``:443`` (https) removed;
    * fragment (``#...``) removed;
    * tracking query parameters removed (``utm_*``, ``fbclid``, ... —
      extend via ``tracking_params``, each entry a regex for the
      parameter NAME);
    * empty query (``?`` left over) removed; trailing ``/`` on a
      non-root path removed;
    * ``sort_query=True`` additionally orders the surviving query
      parameters byte-wise (``a=1&b=2`` == ``b=2&a=1``). This is the
      one step that needs array ops (split → array_sort → rejoin) —
      JVM-interpreted per row, so it is opt-in; everything else stays
      in whole-stage codegen.

    Malformed URLs (no scheme, garbage) pass through trimmed-lowercase
    — a stable key is still a dedup key even when unparseable.
    """
    u = F.trim(url if isinstance(url, Column) else F.col(url))

    scheme = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    path = F.try_parse_url(u, F.lit("PATH"))
    query = F.try_parse_url(u, F.lit("QUERY"))

    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    # HOST is hostname-only; the port lives in AUTHORITY. Re-attach it
    # so ":8080" survives while the scheme-default ":80"/":443" drop.
    authority = F.try_parse_url(u, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    hostport = F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(
        host
    )

    # Strip tracking parameters from the query string, then collapse
    # separator debris ("a=1&&b=2", leading "&"). ONE alternation pass
    # instead of one regexp_replace per parameter (round 15): every
    # pattern is an anchored delete `(^|&)name=[^&]*` -> `$1`, and such
    # deletions can neither create nor destroy other anchored
    # occurrences (a replacement re-emits its anchor, and values cannot
    # contain `&`), so the fused pass is value-identical to the
    # sequential chain — equality-swept over the driver corpus plus
    # adversarial URLs. Parameter-name regexes must stay free of
    # capture groups (both spellings rely on `$1` being the anchor).
    # Empty tracking_params disables stripping entirely: the fused
    # alternation would otherwise degenerate to `(^|&)(?:)=[^&]*`,
    # which strips empty-NAMED params ('?=x') the per-name loop never
    # touched.
    if tracking_params:
        alternation = "|".join(f"(?:{name})" for name in tracking_params)
        query = F.regexp_replace(
            query, rf"(^|&)(?:{alternation})=[^&]*", "$1"
        )
    query = F.regexp_replace(query, r"&&+", "&")
    query = F.regexp_replace(query, r"^&|&$", "")
    if sort_query:
        query = F.when(
            (query.isNotNull()) & (query != ""),
            F.array_join(F.array_sort(F.split(query, "&")), "&"),
        ).otherwise(query)

    # Non-root trailing slash: /a/b/ -> /a/b ; "/" and "" both mean root.
    path = F.regexp_replace(path, r"(.+?)/+$", "$1")
    path = F.when((path == "") | path.isNull(), F.lit("/")).otherwise(path)

    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(
            query.isNotNull() & (query != ""), F.concat(F.lit("?"), query)
        ).otherwise(F.lit("")),
    )
    # Unparseable input (no scheme/host): fall back to a stable key.
    return F.when(
        scheme.isNotNull() & host.isNotNull(), rebuilt
    ).otherwise(F.lower(u))


def dedup_urls(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    keep: str = "min_id",
    canonical_col: Optional[str] = None,
    **canon_kwargs,
) -> DataFrame:
    """Drop refetches of the same canonical URL (keep one row each).

    ``keep="min_id"`` keeps the smallest ``id_col`` per canonical URL
    (deterministic, via a mergeable min-struct hash aggregate — no
    sort, no window); ``keep="any"`` lets Spark keep an arbitrary row
    (``dropDuplicates``, fine when rows are identical refetches). The
    canonical key is added as ``canonical_col`` when a name is given,
    else used transiently. If ``canonical_col`` names a column ALREADY
    present on ``df`` it is trusted as the canonical key and not
    recomputed — pass the :func:`canonicalize_url` projection once and
    share it between a reporting branch and the dedup (the
    ``paragraph_rows`` reuse pattern; the regex chain is the
    expensive part of this operator).
    """
    if keep not in ("min_id", "any"):
        raise ValueError(f"keep must be 'min_id' or 'any', got {keep!r}")

    key = canonical_col or "__canon_url"
    if canonical_col is not None and canonical_col in df.columns:
        with_key = df
    else:
        with_key = df.withColumn(
            key, canonicalize_url(F.col(url_col), **canon_kwargs)
        )
    if keep == "any":
        out = with_key.dropDuplicates([key])
    else:
        # Keep-min is a MERGEABLE hash aggregate: min_by(struct(*row),
        # id) per canonical key. min_by compares ONLY the id, so the
        # carried struct may hold unorderable columns (MapType fetch
        # metadata is a common crawl-row shape — min(struct(*row))
        # would fail analysis on it). Map-side partial combine
        # collapses a hot canonical URL to one row per map task before
        # the exchange; a row_number window would sort the whole hot
        # key inside one unsplittable partition. Determinism requires
        # id_col to be unique per row (ties on id keep an arbitrary
        # row, same as the pre-round-10 window ordered by id alone).
        cols = with_key.columns
        out = (
            with_key.groupBy(key)
            .agg(
                F.min_by(
                    F.struct(*[F.col(c) for c in cols]), F.col(id_col)
                ).alias("__f")
            )
            .select([F.col(f"__f.{c}").alias(c) for c in cols])
        )
    return out if canonical_col else out.drop(key)


#: Extensions that are never extractable text for an LM corpus (media,
#: archives, executables, fonts, style/script assets). PDF/Office docs
#: are included — they need a dedicated extractor, not the HTML path.
NON_TEXT_EXTENSIONS = tuple(
    "jpg jpeg png gif webp svg ico bmp tif tiff heic "
    "mp3 wav ogg flac m4a aac "
    "mp4 avi mkv mov wmv webm flv m4v "
    "zip tar gz tgz bz2 xz 7z rar jar "
    "exe dmg apk msi iso bin deb rpm "
    "pdf doc docx xls xlsx ppt pptx odt ods "
    "css js mjs json xml rss atom wasm map "
    "woff woff2 ttf eot otf".split()
)


def filter_urls(
    df: DataFrame,
    url_col: str = "url",
    allowed_schemes: Sequence[str] = ("http", "https"),
    drop_extensions: Sequence[str] = NON_TEXT_EXTENSIONS,
    blocked_hosts: Optional[Sequence[str]] = None,
    blocked_host_table: Optional[DataFrame] = None,
    blocked_patterns: Sequence[str] = (),
    max_length: int = 2048,
) -> DataFrame:
    """Pre-fetch URL gate: drop rows whose URL can't yield corpus text.

    The cheapest filter in the pipeline — runs before any payload is
    decoded, so it belongs immediately after :func:`..sources.warc.
    read_warc` (or before fetching at all). Drops: non-http(s)
    schemes, paths ending in a non-text extension
    (:data:`NON_TEXT_EXTENSIONS`), overlong URLs (crawler traps),
    hosts on a blocklist, and URLs matching any ``blocked_patterns``
    regex (e.g. ``r"/tag/"`` calendar/faceted-navigation traps).

    ``blocked_hosts`` (a small in-code list) matches the host AND its
    subdomains as one codegen predicate. ``blocked_host_table`` (a
    DataFrame with a ``host`` column, for the multi-million-entry
    lists real pipelines carry) is a broadcast LEFT ANTI join on the
    exact host — pre-expand subdomains into the table or catch them
    with a pattern. Everything else is a single map-only predicate in
    the scan's projection.
    """
    u = F.col(url_col)
    scheme = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    path = F.lower(F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit("")))

    keep = (
        u.isNotNull()
        & (F.length(u) <= max_length)
        & scheme.isin(*[s.lower() for s in allowed_schemes])
        & host.isNotNull()
    )
    if drop_extensions:
        ext = F.regexp_extract(path, r"\.([a-z0-9]{1,6})$", 1)
        # ext comes from the lowercased path; normalize the caller's
        # list the same way or ('PDF',) would silently match nothing
        keep = keep & (
            (ext == "") | ~ext.isin(*[e.lower() for e in drop_extensions])
        )
    if blocked_hosts:
        for b in blocked_hosts:
            b = b.lower()
            keep = keep & (host != b) & ~host.endswith("." + b)
    for pat in blocked_patterns:
        keep = keep & ~u.rlike(pat)
    out = df.filter(keep)
    if blocked_host_table is not None:
        out = out.withColumn("__fu_host", host).join(
            F.broadcast(
                blocked_host_table.select(
                    F.lower(F.col("host")).alias("__fu_host")
                ).distinct()
            ),
            on="__fu_host",
            how="left_anti",
        ).drop("__fu_host")
    return out
