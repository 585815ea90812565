from pgvecto_rs_spark.sources.embedding import text2vec, text2vec_hash  # noqa: F401
from pgvecto_rs_spark.sources.vecs_files import read_fvecs, read_ivecs  # noqa: F401
from pgvecto_rs_spark.sources.bucketed import (  # noqa: F401
    assert_no_exchange,
    read_table,
    write_bucketed,
)
from pgvecto_rs_spark.sources.text_copy import read_vectors_csv  # noqa: F401
