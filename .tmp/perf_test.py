import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, pandas as pd
from pgvecto_rs_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark('perf', cpus=32)
spark.sparkContext.setLogLevel('ERROR')
from pgvecto_rs_spark.operators.search import distance
from pgvecto_rs_spark.queries import Q64
n = 400_000
df = spark.range(n).select('id', F.transform(F.sequence(F.lit(0), F.lit(63)), lambda i: (F.hash(F.col('id')*64+i)%1000).cast('float')/1000.0).alias('v')).repartition(32)
df = df.cache(); df.count()
mk = lambda: df.select('id', distance('v', Q64, 'l2').alias('d'))
mk().orderBy('d').limit(10).collect()
t0=time.perf_counter(); mk().orderBy('d').limit(10).collect(); print('RESULT native', round(time.perf_counter()-t0,2), flush=True)
qb = spark.sparkContext.broadcast(np.array(Q64))
@F.pandas_udf('double')
def l2_np(v: pd.Series) -> pd.Series:
    mat = np.asarray(v.tolist(), dtype=np.float64)
    d = mat - qb.value[None,:]
    return pd.Series(np.einsum('ij,ij->i', d, d))
mkp = lambda: df.select('id', l2_np('v').alias('d'))
mkp().orderBy('d').limit(10).collect()
t0=time.perf_counter(); mkp().orderBy('d').limit(10).collect(); print('RESULT pandas', round(time.perf_counter()-t0,2), flush=True)
