"""IVF multi-probe recall table (VERDICT r10 item 7): the shipped top-k
scale tier held r100 = 3.55x but measured recall@5 = 0.396 while probing
3/25 cells on the adversarial orthogonal-replication corpus. Probing more
of the nearest centroids (multi-probe) is the standard recall lever at a
FIXED nlist — this tool measures the actual trade-off:

    for nprobe in 1, 2, 3, 4, 8:
        recall@5 vs brute-force ground truth
        nominal scan fraction   (nprobe / n_cells)
        measured scan fraction  (avg probed-cell occupancy / n — cells are
                                 NOT uniform, so the nominal number lies)
        wall time (best of 2)

Corpus: the same per-copy sign-flip orthogonal replication the 100x probe
uses (tools/scale_probe_100x._scaled_embeddings_orth — identical
replication would plant quadratic true pairs). Queries: every 50th vector,
the registry's _query_set convention. k-means is deterministic
(farthest-point min-id init), so the operator's internal refit reproduces
the assignment this tool uses for occupancy measurement.

Run alone (concurrent Spark contends ~3x on this box):

    python tools/ivf_multiprobe_probe.py [mult] [nlist]

Prints one JSON document; paste the summary into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from hadoop_data_lake_spark.core.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.01")
NPROBES = [int(x) for x in os.environ.get("IVF_NPROBES", "1,2,3,4,8").split(",")]


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("ivf-multiprobe")

    from pyspark.sql import functions as F

    from hadoop_data_lake_spark.operators.similarity import (
        brute_force_topk,
        ivf_kmeans_topk,
        kmeans_fit_assign,
        scaled_ivf_params,
    )
    from scale_probe_100x import IVF_SCALED, _scaled_embeddings_orth

    emb = _scaled_embeddings_orth(spark, BASE, mult)
    n = emb.count()
    nlist = (
        int(sys.argv[2])
        if len(sys.argv) > 2
        else IVF_SCALED.get(mult, (scaled_ivf_params(n)[0], 0))[0]
    )
    queries = emb.where(F.col("vec_id") % 50 == 0).localCheckpoint(eager=True)
    n_q = queries.count()
    print(f"# corpus n={n}, queries={n_q}, nlist={nlist}", file=sys.stderr)

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    print(f"# ground truth: {len(truth)} (query, neighbor) pairs", file=sys.stderr)

    # one deterministic fit for occupancy measurement (identical to the
    # operator's internal refit — farthest-point min-id init)
    centers, assigned = kmeans_fit_assign(emb, k=nlist)
    occ = {r["cell"]: r["c"] for r in assigned.groupBy("cell").agg(
        F.count("*").alias("c")).collect()}
    q_rows = queries.select("vec_id", "embedding").collect()
    q_mat = np.array([[float(x) for x in r["embedding"]] for r in q_rows])
    d = ((q_mat * q_mat).sum(axis=1)[:, None]
         - 2.0 * (q_mat @ centers.T)
         + (centers * centers).sum(axis=1)[None, :])
    probe_order = np.argsort(d, axis=1, kind="stable")  # per-query cell ranking

    out = {"n": n, "n_queries": n_q, "nlist": nlist, "mult": mult, "rows": {}}
    for nprobe in NPROBES:
        if nprobe > nlist:
            continue
        scanned = [
            sum(occ.get(int(c), 0) for c in probe_order[i, :nprobe])
            for i in range(len(q_rows))
        ]
        best = None
        for _rep in range(2):
            t0 = time.perf_counter()
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in ivf_kmeans_topk(
                    emb, queries, k=5, n_cells=nlist, nprobe=nprobe
                ).collect()
            }
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        recall = len(got & truth) / max(1, len(truth))
        row = {
            "recall5": round(recall, 3),
            "scan_frac_nominal": round(nprobe / nlist, 3),
            "scan_frac_measured": round(float(np.mean(scanned)) / n, 3),
            "sec": round(best, 3),
        }
        out["rows"][str(nprobe)] = row
        print(f"# nprobe={nprobe}: {row}", file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
