#!/usr/bin/env python
"""Round-7 optimization harness (bench.py is FROZEN for measurement; this
file holds the extra instrumentation the optimization round needs).

Modes:
  python bench_extra.py time q1 q2 ...      # best-of-N .count() per query
                                            # (the frozen bench methodology)
  python bench_extra.py noop q1 q2 ...      # noop-sink wall time (guide §1.4)
  python bench_extra.py plans TAG q1 q2 ... # write plans/r07/<q>_<TAG>.txt
                                            # (explain "formatted")

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), SPARK_GRAFT_BENCH_REPEATS (default 3).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def _get(spark=None):
    from xcube_stac_spark.session import get_spark

    return get_spark("xss-bench-extra", master=f"local[{CPUS}]")


def _fn(entry_mod, name):
    qs = entry_mod.queries()
    return qs.get(name) or getattr(entry_mod, f"_q_{name}")


def main() -> int:
    import __spark_entry__ as entry_mod

    mode = sys.argv[1]
    if mode == "plans":
        tag, names = sys.argv[2], sys.argv[3:]
    else:
        tag, names = "", sys.argv[2:]
    spark = _get()
    # warm JVM (excluded)
    spark.range(1000).count()
    out = {}
    os.makedirs("plans/r07", exist_ok=True)
    for name in names:
        fn = _fn(entry_mod, name)
        if mode == "plans":
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"plans/r07/{name}_{tag}.txt", "w") as f:
                f.write(buf.getvalue())
            out[name] = f"plans/r07/{name}_{tag}.txt"
            continue
        runs = []
        for _ in range(REPEATS):
            spark.sparkContext.setJobDescription(f"r07 {mode}: {name}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(runs), "runs": runs}
    print(json.dumps({"mode": mode, "sf_dir": SF_DIR, "cpus": CPUS, **out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
