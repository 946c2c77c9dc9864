"""Dump `.explain("formatted")` for named queries into plans/r11/ as
<query>_<suffix>.txt — the before/after plan evidence for the
optimization round.

Usage: python tools/dump_plan_r11.py before q1_pricing_summary ann_ivf_topk
       python tools/dump_plan_r11.py after  q1_pricing_summary
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_itwiki_spark.plans import catalog  # noqa: E402
from mapreduce_itwiki_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans-r11", cpus=4)
    qs = catalog.queries()
    for name in names:
        df = qs[name](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue().strip() + "\n")
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
