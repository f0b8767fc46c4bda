import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F
spark = (SparkSession.builder.master("local[16]")
    .config("spark.driver.memory","14g")
    .config("spark.sql.adaptive.enabled","true")
    .config("spark.sql.shuffle.partitions","64")
    .config("spark.sql.session.timeZone","UTC").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from cdc_worker_spark.sources.tables import load_events_ms
sf = "/root/repo/.fixtures/sf100"
ev = load_events_ms(spark, sf)
t0=time.time()
med = ev.groupBy("event_type").agg(F.round(F.median("value"), 6).alias("med_value"))
print("median side:", med.collect(), round(time.time()-t0,1), flush=True)
t0=time.time()
counts = ev.groupBy("event_type","user_id").agg(F.count(F.lit(1)).alias("c"))
mx = Window.partitionBy("event_type")
mode = (counts.withColumn("mx", F.max("c").over(mx))
        .filter(F.col("c")==F.col("mx")).groupBy("event_type")
        .agg(F.min("user_id").alias("mode_user")))
print("mode side:", mode.collect(), round(time.time()-t0,1), flush=True)
