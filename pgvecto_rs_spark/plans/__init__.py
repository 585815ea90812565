from pgvecto_rs_spark.plans.rewrite import IndexCatalog, Planner  # noqa: F401
