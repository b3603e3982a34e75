import os
import signal

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

# Per-test wall-clock guard (round-10, verdict item 8): pytest-timeout
# is not installable in this environment, so a SIGALRM watchdog fills
# in — a hung streaming/py4j call fails its one test instead of
# stalling the whole suite. Override with SPARK_GRAFT_TEST_TIMEOUT
# (seconds; 0 disables). SIGALRM interrupts the main test thread only,
# which is where pytest runs test bodies.
_TEST_TIMEOUT = int(os.environ.get("SPARK_GRAFT_TEST_TIMEOUT", "900"))


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    if _TEST_TIMEOUT <= 0 or os.name != "posix":
        return (yield)

    def _alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded SPARK_GRAFT_TEST_TIMEOUT={_TEST_TIMEOUT}s"
        )

    previous = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(_TEST_TIMEOUT)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, previous)


@pytest.fixture(scope="session")
def spark():
    from patito_spark.session import get_session

    session = get_session("patito_spark-tests")
    yield session


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
