"""One profiled KG run with event logging, for BENCH/profile_gaps.py.

Usage: taskset -c 0-(N-1) python BENCH/profile_run.py <cores> <n_pages>
Prints the timed-run epoch-ms start so gaps can be attributed to the
timed section (the same session runs a warmup first).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500_000
evdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/evlog5"
os.makedirs(evdir, exist_ok=True)
os.environ.setdefault("SPARK_GRAFT_BENCH_NPARTS", str(4 * cores))

from pywdcollections_spark.session import get_spark  # noqa: E402
import bench  # noqa: E402

spark = get_spark("prof", cores=cores, shuffle_partitions=cores,
                  extra_conf={"spark.eventLog.enabled": "true",
                              "spark.eventLog.dir": evdir,
                              "spark.eventLog.rolling.enabled": "false",
                              "spark.eventLog.compress": "false"})
spark.sparkContext.setLogLevel("ERROR")
bench.run_kg(spark, max(50_000, n_pages // 10))
print("TIMED_START_MS", int(time.time() * 1000), flush=True)
print("RESULT", bench.run_kg(spark, n_pages), flush=True)
print("APP_ID", spark.sparkContext.applicationId, flush=True)
spark.stop()
