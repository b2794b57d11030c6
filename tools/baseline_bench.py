#!/usr/bin/env python3
"""Make BASELINE numeric: time the reference's OWN transform pipeline
(/root/reference — imported, never copied) against graft's writeTasks
on IDENTICAL extracted-block input, single node.

Reference half — faithful reproduction of FileOutput.py:130-169's job
shape without dask (not installed here): dask `bag.read_text(...,
files_per_partition=16).map(FileOutput.transform)` becomes a
multiprocessing.Pool over 16-file chunks; each chunk parses every
block once, applies ALL TransformTask transforms to the shared parse
(exactly FileOutput.transform's aggregation), builds one pandas
DataFrame per task per chunk with TransformTask's meta columns, and
writes it as one parquet part — the same per-partition to_parquet
layout dask produces. Pool startup is excluded from the wall the same
way JVM/session startup is excluded on the graft side: the quotient
is steady-state engine throughput.

Graft half — `sbt runMain graft.etl.EtlBaselineBench`, which times
BlockIngest.readAuto + FileSink.writeTasks(transactions, transfers,
blocks, errors) over the same files and prints its own wall.

Input generation: the two mainnet block fixtures
(src/test/resources/blocks/) widened to `--tx-per-block` transactions
(realistic mainnet blocks carry hundreds to thousands) and replicated
to `--blocks` distinct slots (blockTime patched per slot). Both
engines read the same gzip envelope files.

Usage:
  python3 tools/baseline_bench.py [--blocks 4000] [--tx-per-block 300]
      [--workers 32] [--runs 2] [--out target/baseline]
Writes <out>/BASELINE_MEASURED.json.
"""
import argparse
import gzip
import json
import multiprocessing as mp
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/reference")

REPO = Path(__file__).resolve().parent.parent
FIXTURES = REPO / "src/test/resources/blocks"


def build_inputs(dest: Path, n_blocks: int, tx_per_block: int, workers: int):
    """Widen the fixture blocks to tx_per_block transactions and
    replicate across n_blocks distinct slots."""
    templates = []
    for name in ("block_100.json.gz", "block_101.json"):
        p = FIXTURES / name
        raw = gzip.open(p, "rt").read() if name.endswith(".gz") else p.read_text()
        env = json.loads(raw)
        txs = env["result"]["transactions"]
        widened = []
        i = 0
        while len(widened) < tx_per_block:
            t = json.loads(json.dumps(txs[i % len(txs)]))  # deep copy
            # distinct signature per transaction within the block
            t["transaction"]["signatures"][0] += f"_{i}"
            widened.append(t)
            i += 1
        env["result"]["transactions"] = widened
        env["result"]["blockTime"] = 1650000000  # patched per slot below
        templates.append(json.dumps(env))
    dest.mkdir(parents=True, exist_ok=True)
    args = [(str(dest / f"block_{100 + i}.json.gz"),
             templates[i % 2].replace("1650000000", str(1650000000 + i)))
            for i in range(n_blocks)]
    with mp.Pool(workers) as pool:
        pool.starmap(_write_gz, args, chunksize=64)


def _write_gz(path: str, text: str):
    # fixed mtime + compresslevel for determinism and speed
    with gzip.open(path, "wt", compresslevel=1) as f:
        f.write(text)


def _reference_chunk(chunk_and_dest):
    """One dask-bag partition's work (FileOutput.py:67-91 transform +
    per-partition to_parquet), on the reference's own code."""
    import pandas as pd
    from src.load.TransformTask import TransformTask

    chunk_id, files, dest = chunk_and_dest
    tasks = {t.name: t for t in TransformTask.all()}
    results = {name: [] for name in tasks}
    errors = []
    for path in files:
        text = gzip.open(path, "rt").read()
        source = Path(path).name
        try:
            from src.transform.Block import Block
            block = Block(json.loads(text), source)
            for name, task in tasks.items():
                rows, errs = task.transform(block)
                results[name].extend(rows)
                errors.extend(errs)
        except Exception as e:  # FileOutput.transform's catch-all
            errors.append(["json_to_blocks", source, str(e)])
    for name, task in tasks.items():
        df = pd.DataFrame(results[name],
                          columns=[c[0] for c in task.meta])
        out = Path(dest) / f"out_{name.lower()}"
        out.mkdir(parents=True, exist_ok=True)
        df.to_parquet(out / f"part.{chunk_id}.parquet", index=False)
    edf = pd.DataFrame(errors, columns=["source", "error", "path"])
    eout = Path(dest) / "out_errors"
    eout.mkdir(parents=True, exist_ok=True)
    edf.to_parquet(eout / f"part.{chunk_id}.parquet", index=False)


def time_reference(blocks_dir: Path, dest: Path, workers: int, runs: int):
    files = sorted(str(p) for p in blocks_dir.glob("*.json.gz"))
    chunks = [files[i:i + 16] for i in range(0, len(files), 16)]
    walls = []
    for r in range(runs):
        rdest = dest / f"ref_run{r}"
        if rdest.exists():
            shutil.rmtree(rdest)
        with mp.Pool(workers) as pool:
            # pool is up before the clock starts (see module doc)
            pool.map(_warm, range(workers))
            t0 = time.monotonic()
            pool.map(_reference_chunk,
                     [(i, c, str(rdest)) for i, c in enumerate(chunks)],
                     chunksize=1)
            walls.append(time.monotonic() - t0)
    return walls


def _warm(_):
    from src.load.TransformTask import TransformTask  # noqa: F401
    return 0


def time_graft(blocks_dir: Path, dest: Path, runs: int):
    import os
    env = dict(os.environ)
    # the 8g default heap exits 52/OOM beyond ~10k wide blocks
    env.setdefault("SPARK_DRIVER_MEM", "64g")
    out = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.etl.EtlBaselineBench {blocks_dir} {dest}/graft {runs}"],
        cwd=REPO, capture_output=True, text=True, timeout=3600, env=env)
    for line in out.stdout.splitlines():
        line = line.strip().removeprefix("[info] ").strip()
        if line.startswith('{"graft_sec"'):
            return json.loads(line)
    sys.exit(f"no graft bench output; stdout tail:\n{out.stdout[-2000:]}\n"
             f"stderr tail:\n{out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=4000)
    ap.add_argument("--tx-per-block", type=int, default=300)
    ap.add_argument("--workers", type=int, default=32)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="target/baseline")
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    out = REPO / args.out
    blocks_dir = out / "blocks"
    if not args.skip_gen:
        t0 = time.monotonic()
        build_inputs(blocks_dir, args.blocks, args.tx_per_block, args.workers)
        print(f"generated {args.blocks} blocks x {args.tx_per_block} tx "
              f"in {time.monotonic() - t0:.1f}s", flush=True)

    ref_walls = time_reference(blocks_dir, out, args.workers, args.runs)
    print(f"reference walls: {ref_walls}", flush=True)
    graft = time_graft(blocks_dir, out, args.runs)
    print(f"graft walls: {graft['runs']}", flush=True)

    result = {
        "input": {"blocks": args.blocks, "tx_per_block": args.tx_per_block,
                  "workers": args.workers, "runs": args.runs},
        "reference_sec": min(ref_walls),
        "reference_runs": ref_walls,
        "graft_sec": graft["graft_sec"],
        "graft_runs": graft["runs"],
        "graft_over_reference": round(graft["graft_sec"] / min(ref_walls), 3),
    }
    (out / "BASELINE_MEASURED.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
