import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from flink_clickstream_processor_msk_spark import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # spark.default.parallelism=4: tests build their corpora/batches with
    # spark.createDataFrame(local_list), which slices into
    # defaultParallelism pickled partitions — at local[32] every
    # coalesce(1) sink append/sidecar write then drained 32 near-empty
    # slices sequentially (~0.15 s EACH, measured r17: a 30-row index
    # append cost 4.7-6 s vs 0.57 s with small slices). 4 slices keeps
    # multi-core paths exercised while cutting that fixed cost 8×. Test
    # data is tiny by design; semantics are partition-count-independent
    # (pinned where it matters, e.g. kmeans partition independence).
    s = get_spark(
        app_name="tests",
        shuffle_partitions=4,
        extra_conf={"spark.default.parallelism": "4"},
    )
    yield s
    s.stop()
