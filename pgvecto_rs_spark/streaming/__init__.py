from pgvecto_rs_spark.streaming.freshness import FreshVectorIndex  # noqa: F401
from pgvecto_rs_spark.streaming.neardup import StreamingNearDup  # noqa: F401
from pgvecto_rs_spark.streaming.optimizer import (  # noqa: F401
    IndexOptimizer,
    run_optimizer,
)
