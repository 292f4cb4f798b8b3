"""Matrix-profile operator scaling probe: same workload at local[8] vs
local[32], subprocess-isolated sessions (JVM reuse gotcha)."""
import json, subprocess, sys, os

LEG = '''
import time, sys
sys.path.insert(0, "/root/repo")
import numpy as np
from dtaidistance_spark.session import get_spark
from dtaidistance_spark.operators.matrixprofile import matrix_profile
cores = int(sys.argv[1])
spark = get_spark(app_name=f"mp-scale-{cores}", cores=cores)
rng = np.random.default_rng(7)
rows = [(f"s{i:04d}", rng.integers(0, 40, 2048).astype(float).tolist())
        for i in range(256)]
df = spark.createDataFrame(rows, "series_id string, values array<double>") \
          .repartition(4 * cores, "series_id").cache()
df.count()
out = matrix_profile(df, m=64)
out.count()  # warm
t0 = time.monotonic()
n = out.count()
el = time.monotonic() - t0
# windows per series = 2048-64+1 = 1985; pair-evals per series ~ k^2
k = 1985
print(f"RESULT {cores} {el:.3f} {n} {256 * k * k / el / 1e6:.1f}")
'''
res = {}
for cores in (8, 32):
    p = subprocess.run([sys.executable, "-c", LEG, str(cores)],
                       capture_output=True, text=True, timeout=900)
    line = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
    if not line:
        sys.exit(f"leg local[{cores}] produced no RESULT "
                 f"(exit {p.returncode}); stderr tail:\n{p.stderr[-500:]}")
    print(line[0])
    c, el, n, thr = line[0].split()[1:]
    res[int(c)] = (float(el), int(n), float(thr))
eff = (res[8][0] / res[32][0]) / 4.0
print(json.dumps({"local8_s": res[8][0], "local32_s": res[32][0],
                  "rows": res[8][1], "Mpairevals_per_s_8": res[8][2],
                  "Mpairevals_per_s_32": res[32][2],
                  "scaling_eff_8to32": round(eff, 3)}))
