"""Real-codec (Pillow) pHash throughput + decade subset (verdict r12 #9).

The committed sf1->sf3 image decade row (docs/scaling.md) measured the
fake-pHash path: it pins the PLAN shape (map-only kernel, distinct-
signature collapse, star edges) but not the real DCT kernel's constant.
This tool measures that constant where Pillow exists:

* synthesizes N valid PNGs (pure stdlib writer below - no Pillow needed
  to GENERATE, only to decode), 10% byte-identical "reposts";
* times image_phash(use_real_codecs=True) end-to-end (noop sink) at N
  and 3N -> images/s and the @3x growth factor;
* prints the docs/perf.md row.

Exits 0 with a notice when Pillow is absent (this repo's CI container
does not ship it); run on a Pillow host and paste the row into
docs/perf.md next to the BPE throughput table.

Usage: python tools/profile_image_real.py [--n 50000] [--side 64]
"""

from __future__ import annotations

import argparse
import os
import struct
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_png(side: int, seed: int) -> bytes:
    """A valid 8-bit grayscale PNG with deterministic pseudo-random
    content — pure stdlib (struct + zlib), so blob GENERATION never
    needs a codec library."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", side, side, 8, 0, 0, 0, 0)
    rows = bytearray()
    state = seed & 0xFFFFFFFF or 1
    for _ in range(side):
        rows.append(0)  # filter type 0 per scanline
        for _ in range(side):
            # xorshift32: cheap, deterministic, codec-independent
            state ^= (state << 13) & 0xFFFFFFFF
            state ^= state >> 17
            state ^= (state << 5) & 0xFFFFFFFF
            rows.append(state & 0xFF)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(rows), 6))
        + chunk(b"IEND", b"")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--side", type=int, default=64)
    ap.add_argument("--runs", type=int, default=3)
    a = ap.parse_args()

    try:
        import PIL  # noqa: F401

        lane = "Pillow"
    except ImportError:
        # Round 14: the real lane no longer dies without Pillow — it
        # rides the vendored baseline-PNG decoder
        # (multimodal._png_decode_gray), which is a REAL decode of
        # these synthetic PNGs (zlib inflate + unfilter), so the
        # decode+DCT constant is measurable in this container.
        lane = "vendored-PNG"
    print(f"real-codec lane: {lane}")

    from patito_spark.functions.cache import release_caches
    from patito_spark.operators.multimodal import image_phash
    from patito_spark.session import get_session

    spark = get_session("profile-image-real")
    spark.sparkContext.setLogLevel("ERROR")

    # distinct pool + 10% byte-identical reposts, same mix as the
    # committed fake-path decade
    pool = [synth_png(a.side, s + 1) for s in range(256)]
    repost = synth_png(a.side, 9999)

    def blobs(n: int):
        rows = [
            (i, repost if i % 10 == 0 else pool[i % len(pool)])
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "doc_id long, blob binary")

    results = {}
    for label, n in (("1x", a.n), ("3x", 3 * a.n)):
        df = blobs(n)
        best = float("inf")
        for _ in range(a.runs):
            t0 = time.perf_counter()
            image_phash(df, use_real_codecs=True).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            release_caches()
        results[label] = (n, best)
        print(f"{label}: {n} imgs ({a.side}x{a.side}) in {best:.2f}s "
              f"= {n / best:,.0f} imgs/s")
    growth = results["3x"][1] / results["1x"][1]
    print(
        f"perf.md row: | image_phash real DCT ({a.side}x{a.side} PNG) | "
        f"{results['1x'][0] / results['1x'][1]:,.0f} imgs/s | "
        f"@3x growth {growth:.2f}x |"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
