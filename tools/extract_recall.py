"""Post-processing parity with the reference's ``extract_recall.py`` /
``exp_scripts`` renderers: turn the per-config result parquet that
``tools/experiments.py`` (via ``cli.py query-attribution``) writes into the
recall-vs-probes comparison tables the reference's paper plots are built
from (reference ``extract_recall.py:37-60`` drives OracleRecall per config
and collects ``.oracle_recall`` artifacts; the plotting happens offline).

    python tools/extract_recall.py --out exp_outputs [--csv]

For every ``<out>/<dataset>.<method>.k=<s>[.o=<o>]`` result directory this
reads the (algorithm, budget, num_voting, ef, nprobes, recall, qps, pareto)
grid and renders, per (dataset, num_shards):

- a **method × nprobes best-recall table** (max over route configs and ef —
  the curve each paper figure shows per partitioner), and
- the **global Pareto front** across methods (recall, qps, method, config).

``--csv`` additionally writes ``<out>/<dataset>.k=<s>.recall_curves.csv``
and ``...pareto.csv`` next to the inputs. Pure driver-side pandas — the
grids are config-sized, same as the reference's offline post-processing.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULT_RE = re.compile(r"^(?P<dataset>[^.]+)\.(?P<method>[A-Za-z]+)\.k=(?P<k>\d+)(?P<sfx>\.o=[\d.]+)?$")


def discover(out_dir: str) -> pd.DataFrame:
    """One row per result dir: dataset, method(+overlap suffix), shards, path."""
    rows = []
    for path in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(path):
            continue
        m = RESULT_RE.match(os.path.basename(path))
        if not m or not glob.glob(os.path.join(path, "*.parquet")):
            continue
        rows.append(
            {
                "dataset": m.group("dataset"),
                "method": m.group("method") + (m.group("sfx") or ""),
                "num_shards": int(m.group("k")),
                "path": path,
            }
        )
    return pd.DataFrame(rows)


def load_grid(path: str) -> pd.DataFrame:
    """Read a result dir's parquet without a SparkSession — the grids are
    tiny driver-side artifacts (pyarrow reads the directory directly)."""
    import pyarrow.parquet as pq

    return pq.read_table(path).to_pandas()


def recall_curves(results: pd.DataFrame) -> pd.DataFrame:
    """nprobes × method table of best recall (max over route configs and
    ef) for one (dataset, num_shards) group."""
    frames = []
    for _, r in results.iterrows():
        g = load_grid(r["path"])
        best = g.groupby("nprobes", as_index=False)["recall"].max()
        best["method"] = r["method"]
        frames.append(best)
    long = pd.concat(frames, ignore_index=True)
    return long.pivot_table(index="nprobes", columns="method", values="recall").round(4)


def pareto_table(results: pd.DataFrame) -> pd.DataFrame:
    """Global Pareto front across methods (re-filtered over the union —
    each per-method grid only knows its own dominance)."""
    frames = []
    for _, r in results.iterrows():
        g = load_grid(r["path"]).copy()
        g["method"] = r["method"]
        frames.append(g)
    allg = pd.concat(frames, ignore_index=True)
    keep = [
        not any(
            ((o.recall >= row.recall) and (o.qps > row.qps))
            or ((o.recall > row.recall) and (o.qps >= row.qps))
            for o in allg.itertuples()
        )
        for row in allg.itertuples()
    ]
    front = allg[pd.Series(keep, index=allg.index)]
    cols = [c for c in ("method", "algorithm", "budget", "num_voting", "ef", "nprobes", "recall", "qps") if c in front.columns]
    return front[cols].sort_values("recall", ascending=False).round({"recall": 4, "qps": 1})


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="exp_outputs")
    ap.add_argument("--csv", action="store_true", help="also write CSV artifacts next to the inputs")
    args = ap.parse_args(argv)
    found = discover(args.out)
    if found.empty:
        print(f"no result directories under {args.out}")
        return 1
    for (dataset, shards), grp in found.groupby(["dataset", "num_shards"]):
        curves = recall_curves(grp)
        front = pareto_table(grp)
        print(f"\n== {dataset} k={shards}: best recall@nprobes by method ==")
        print(curves.to_string())
        print(f"\n== {dataset} k={shards}: global Pareto front ==")
        print(front.to_string(index=False))
        if args.csv:
            curves.to_csv(os.path.join(args.out, f"{dataset}.k={shards}.recall_curves.csv"))
            front.to_csv(os.path.join(args.out, f"{dataset}.k={shards}.pareto.csv"), index=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
