"""Spark-free memory-bandwidth saturation probe for the tagger core.

The N→4N scaling table (BENCH.md) shows efficiency declining once the
4N config's effective demand approaches the physical core count, in
BOTH execution modes — local[N] (one shared JVM) and
local-cluster[N/2,2,·] (separate executor JVMs).  The separate-JVM
control rules out shared-process effects (one GC, one JIT code cache,
one lock-contended allocator), leaving the shared physical memory
subsystem as the suspect.  This probe removes Spark entirely and
tests that suspect directly:

    K independent OS processes, each running the SAME pure-numpy
    BiLSTM-CRF forward pass (ner/model_np.tag_batch — the exact
    kernel the pipeline's mapInPandas workers run) over the SAME
    deterministic corpus, BLAS pinned to 1 thread per process
    (exactly how the pipeline pins its python workers).

If per-process throughput at K processes stays flat as K grows, the
hardware scales and any Spark-side decline would indict the engine.
If per-process throughput FALLS as K grows — with zero Spark, zero
JVM, zero shuffle, zero GIL sharing (separate processes) — the box's
memory subsystem is the ceiling, and the same decline must appear in
any engine running K copies of this kernel on this box.  On a real
cluster, N and 4N *executors* ship their own DRAM channels, which is
why the fits-in-box pair is the engine signal and the saturated pairs
measure the hardware.

Usage:  python tools/membw_probe.py [--procs 1,2,4,8,16,32]
                                    [--seconds 12] [--convs 400]
Writes MEMBW_probe.json at the repo root and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

# BLAS single-threaded BEFORE numpy loads anywhere downstream — the
# same pinning the Spark session applies to its python workers
# (session.py spark.executorEnv.*_NUM_THREADS=1).
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = "1"

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _corpus(n_convs: int) -> list[list[str]]:
    """Deterministic char sequences — the same template corpus the
    scaling sweep tags (fixtures/transcripts.gen_conv), capped to
    turns so every worker's batch mix matches the pipeline's."""
    from ner_spark.fixtures.transcripts import gen_conv

    seqs: list[list[str]] = []
    for conv_ord in range(n_convs):
        turns, _ = gen_conv(f"c{conv_ord:06d}", conv_ord)
        seqs.extend(list(t[3]) for t in turns)
    return seqs


def _worker(seconds: float, n_convs: int, batch: int, out_q) -> None:
    """One saturation worker: load the model, warm up once, then tag
    the corpus in a loop for ``seconds`` of steady state; report
    chars/sec.  Each process loads its own parameter copy (no shared
    pages beyond the OS page cache) — like a Spark python worker."""
    from ner_spark.ner.model_np import tag_batch
    from ner_spark.ner.train_np import MODEL_PATH, load_or_train

    params, vocab = load_or_train(MODEL_PATH)
    seqs = _corpus(n_convs)
    batches = [seqs[i : i + batch] for i in range(0, len(seqs), batch)]

    # warmup: one full pass (page in the tables, stabilize allocs)
    for b in batches:
        tag_batch(b, vocab, params)

    chars = 0
    t0 = time.perf_counter()
    deadline = t0 + seconds
    while time.perf_counter() < deadline:
        for b in batches:
            tag_batch(b, vocab, params)
            chars += sum(len(s) for s in b)
        # full-corpus granularity keeps per-process work identical
    dt = time.perf_counter() - t0
    out_q.put(chars / dt)


def run(procs: list[int], seconds: float, n_convs: int, batch: int) -> dict:
    ctx = mp.get_context("spawn")  # no COW-shared model pages
    results: dict[int, dict] = {}
    for k in procs:
        q = ctx.Queue()
        ps = [
            ctx.Process(target=_worker, args=(seconds, n_convs, batch, q))
            for _ in range(k)
        ]
        t0 = time.perf_counter()
        for p in ps:
            p.start()
        rates = [q.get() for _ in ps]
        for p in ps:
            p.join()
        per = sum(rates) / len(rates)
        results[k] = {
            "procs": k,
            "per_proc_chars_per_sec": round(per, 1),
            "aggregate_chars_per_sec": round(sum(rates), 1),
            "min_proc": round(min(rates), 1),
            "max_proc": round(max(rates), 1),
            "wall_sec": round(time.perf_counter() - t0, 1),
        }
        print(f"[membw] {results[k]}", file=sys.stderr)
    # retention baseline = the SMALLEST process count measured, not
    # the first config passed — `--procs 8,1,2` must not make the
    # "vs min procs" ratios silently relative to the 8-proc run
    base = results[min(results)]["per_proc_chars_per_sec"]
    for k in results:
        results[k]["per_proc_retention_vs_min_procs"] = round(
            results[k]["per_proc_chars_per_sec"] / base, 3
        )
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2,4,8,16,32")
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument("--convs", type=int, default=400)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()
    procs = [int(x) for x in args.procs.split(",")]
    results = run(procs, args.seconds, args.convs, args.batch)
    summary = {
        "metric": "tagger_kernel_per_proc_retention",
        "unit": "ratio vs 1 process",
        "note": (
            "pure numpy BiLSTM-CRF kernel in K separate OS processes, "
            "no Spark/JVM — per-process decline = shared memory "
            "subsystem, not the engine"
        ),
        "results": {str(k): v for k, v in results.items()},
    }
    with open(os.path.join(_REPO, "MEMBW_probe.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
