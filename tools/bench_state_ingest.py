#!/usr/bin/env python
"""Per-batch cost of incremental state maintenance as state grows.

VERDICT r9 "what's missing" #1: the versioned-state twins re-aggregated
and rewrote the WHOLE state every micro-batch — O(|state|) per batch, the
last scale-killer shape in the streaming family.  Round 10 buckets the
state by pmod(xxhash64(key), B) and rewrites only the buckets a batch
touches.  This rung measures exactly that claim, the way
tools/bench_ann_ingest.py measured the IVF upsert: seed the state with S
items (micro-batch 0), then feed N_SMALL fixed-size small batches (~100
items each) and time each one via the on_batch hook deltas.

Two shapes per rung, same source, same end state (asserted):
  - bucketed: n_buckets sized so a bucket holds ~1.5–2k keys (what a
    deployment does — bucket count scales with the dimension, bucket
    SIZE stays constant), so a 100-item batch reads+rewrites ~100
    constant-size buckets regardless of S → per-batch wall FLAT.
  - full-rewrite: n_buckets=1 reproduces the pre-round-10 layout (one
    bucket = the whole state) → per-batch wall grows with S.

Usage: python tools/bench_state_ingest.py            (default ladder)
       python tools/bench_state_ingest.py 100000:64 400000:256
       python tools/bench_state_ingest.py --scd2 200000:256 ...
           (same ladder over incremental_scd2: seed = one event per
           user, then 100-user CDC chunks whose timestamps postdate
           every earlier chunk — the time-ordered contract)
       python tools/bench_state_ingest.py --docs 400000:256 ...
           (same ladder over incremental_doc_dedup: seed = S distinct
           documents, then 100-doc chunks half duplicate / half novel —
           the ingestion gate's real mix; key = md5(text))
       python tools/bench_state_ingest.py --neardup 40000:512 ...
           (incremental_neardup: seed = S distinct ~40-token documents,
           then 100-doc chunks half NEAR-dup / half novel; two shapes —
           append-only band history scanned per probe vs the same state
           COMPACTED after the seed (compact_neardup_bands), the
           production cadence whose per-batch wall stays flat in S)
       python tools/bench_state_ingest.py --neardup-probe 160000 2560000
           (probe ISOLATION, VERDICT r11 #7: time just the candidate
           join against the band state — no writes in the loop — for
           the append-only and compacted shapes, so the data term the
           full ladder's fixed per-batch cost drowns becomes visible)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

RUNGS = [(400_000, 256), (1_600_000, 1024), (6_400_000, 4096)]
# Near-dup rungs are smaller in rows but bigger per row: state carries
# each doc's ~38-element hashed-shingle set plus 8 band rows, and the
# seed batch pays the full 32-member minhash derivation over S docs.
# 16× growth across the ladder still answers the flatness question.
NEARDUP_RUNGS = [(10_000, 128), (40_000, 512), (160_000, 2048)]
N_SMALL = 6
BATCH_ITEMS = 100


def _write_chunk(path: str, items: np.ndarray, mtime: float) -> None:
    n = len(items)
    tbl = pa.table(
        {
            "user_id": pa.array(np.arange(n, dtype=np.int64)),
            "item_id": pa.array(items.astype(np.int64)),
            # Exact multiples of 1e-6 (the DECIMAL(38,6) contract).
            "rating": pa.array((items % 9).astype(np.float64) / 2.0 + 0.5),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def build_source(src: str, s_items: int) -> None:
    """Seed chunk (every item once) + N_SMALL 100-item chunks, mtimes
    strictly increasing so the file source drains them in order."""
    os.makedirs(src)
    t0 = time.time()
    _write_chunk(f"{src}/chunk00.parquet", np.arange(s_items), t0)
    for i in range(N_SMALL):
        items = (7919 * (i + 1) + 104729 * np.arange(BATCH_ITEMS)) % s_items
        _write_chunk(f"{src}/chunk{i + 1:02d}.parquet", items, t0 + i + 1)


def _write_event_chunk(
    path: str, users: np.ndarray, chunk_idx: int, mtime: float
) -> None:
    """One event per user, timestamped AFTER every earlier chunk (the
    incremental_scd2 CDC contract), statuses alternating per chunk so
    runs genuinely extend/close."""
    n = len(users)
    base = np.datetime64("2024-01-01T00:00:00") + np.timedelta64(
        chunk_idx * 3600, "s"
    )
    tbl = pa.table(
        {
            "event_id": pa.array(
                chunk_idx * 100_000_000 + np.arange(n, dtype=np.int64)
            ),
            "ts": pa.array(base + np.arange(n, dtype="timedelta64[s]")),
            "user_id": pa.array(users.astype(np.int64)),
            "event_type": pa.array(
                np.where((users + chunk_idx) % 2 == 0, "click", "view")
            ),
            "value": pa.array(np.ones(n)),
            "props": pa.array([None] * n, type=pa.string()),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def build_event_source(src: str, s_users: int) -> None:
    os.makedirs(src)
    t0 = time.time()
    _write_event_chunk(f"{src}/chunk00.parquet", np.arange(s_users), 0, t0)
    for i in range(N_SMALL):
        users = (7919 * (i + 1) + 104729 * np.arange(BATCH_ITEMS)) % s_users
        _write_event_chunk(
            f"{src}/chunk{i + 1:02d}.parquet", np.unique(users), i + 1, t0 + i + 1
        )


def _write_doc_chunk(
    path: str, doc_ids: np.ndarray, content_ids: np.ndarray, mtime: float
) -> None:
    """Documents whose text is a pure function of ``content_ids`` — reuse
    a content id and the doc is an exact duplicate that must die at the
    ingestion gate; the state key is md5(text), computed on read."""
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids.astype(np.int64)),
            "text": pa.array([f"document body {c}" for c in content_ids]),
            "lang": pa.array(["en"] * len(doc_ids)),
            "source": pa.array(["bench"] * len(doc_ids)),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def build_doc_source(src: str, s_docs: int) -> None:
    """Seed chunk of S distinct documents, then N_SMALL 100-doc chunks:
    half duplicates of seed content (the gate's work), half novel."""
    os.makedirs(src)
    t0 = time.time()
    _write_doc_chunk(
        f"{src}/chunk00.parquet", np.arange(s_docs), np.arange(s_docs), t0
    )
    half = BATCH_ITEMS // 2
    for i in range(N_SMALL):
        dup = (7919 * (i + 1) + 104729 * np.arange(half)) % s_docs
        new = s_docs + i * half + np.arange(half)
        _write_doc_chunk(
            f"{src}/chunk{i + 1:02d}.parquet",
            s_docs + i * BATCH_ITEMS + np.arange(BATCH_ITEMS),
            np.concatenate([dup, new]),
            t0 + i + 1,
        )


def _neardup_text(content_id: int) -> str:
    """40-token text as a pure function of the content id; near-dup
    variants (see build_neardup_source) share all but the last token —
    3-shingle Jaccard = 36/40, comfortably over the 0.8 gate.  Tokens
    are UNIQUE per content (w{c}x{j}) so distinct contents share no
    shingle: the only candidate pairs are the PLANTED near-dups, and
    per-batch candidate work stays constant as S grows.  The first
    formulation (w{(c·31+j) % 50000}) let contents in the same residue
    class share shifted 39-token runs — genuine accidental near-dups
    whose count grew with S, so the rung measured candidate volume, not
    state machinery (a 100-doc batch touched 2005 of 2048 doc buckets)."""
    return " ".join(f"w{content_id}x{j}" for j in range(40))


def _write_neardup_chunk(
    path: str, doc_ids: np.ndarray, texts: list, mtime: float
) -> None:
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids.astype(np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(doc_ids)),
            "source": pa.array(["bench"] * len(doc_ids)),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def build_neardup_source(src: str, s_docs: int, part: str = "all") -> None:
    """Seed chunk of S distinct documents, then N_SMALL 100-doc chunks:
    half NEAR-duplicates of seed content (same 40 tokens, last one
    changed — these must die at the gate via a probe of the accumulated
    state), half novel.  ``part``: "all" writes both; "seed"/"small"
    write one side into the dir (small with later mtimes) — the
    compacted shape stages the seed alone, drains, compacts, THEN lands
    the small chunks (the production maintenance cadence)."""
    os.makedirs(src, exist_ok=True)
    t0 = time.time()
    if part in ("all", "seed"):
        _write_neardup_chunk(
            f"{src}/chunk00.parquet",
            np.arange(s_docs),
            [_neardup_text(c) for c in range(s_docs)],
            t0,
        )
    if part == "seed":
        return
    half = BATCH_ITEMS // 2
    for i in range(N_SMALL):
        dup = (7919 * (i + 1) + 104729 * np.arange(half)) % s_docs
        texts = [
            _neardup_text(int(c)).rsplit(" ", 1)[0] + " znear" for c in dup
        ] + [
            _neardup_text(s_docs + i * half + j) for j in range(half)
        ]
        _write_neardup_chunk(
            f"{src}/chunk{i + 1:02d}.parquet",
            s_docs + i * BATCH_ITEMS + np.arange(BATCH_ITEMS),
            texts,
            t0 + i + 1,
        )


def build_synthetic_band_state(
    bands_v0: str, s_docs: int, skip_ids: np.ndarray
) -> int:
    """Write ``s_docs − len(skip_ids)`` seed docs' worth of FILLER band
    rows (8 per doc, random 32-hex bsigs) directly as parquet — the
    probe's data term depends on the state's SHAPE (row count, unique
    keys, file layout), not on minhash fidelity: the ladder's generator
    is collision-free by construction (unique per-content tokens), so a
    non-probed seed doc's bsigs never match anything and random hex is
    distribution-identical.  Real derivation runs only for the probed
    contents (the caller merges those rows in) and the probe batch —
    deriving 2.56M real signatures (~2.6 ms/doc through the portable
    decimal minhash) would cost ~2 h for rows whose VALUES the join
    never matches.  Files carry ~4M rows each, bsig-sorted (row-group
    stats), modeling the post-backfill append state; returns rows
    written."""
    os.makedirs(bands_v0, exist_ok=True)
    rng = np.random.default_rng(1 << 20 | s_docs)
    step = 500_000  # docs per file → ~4M band rows
    total = 0
    for k, lo in enumerate(range(0, s_docs, step)):
        hi = min(lo + step, s_docs)
        ids = np.arange(lo, hi, dtype=np.int64)
        ids = ids[~np.isin(ids, skip_ids)]
        n = len(ids) * 8
        bsig = np.frombuffer(
            rng.bytes(n * 16).hex().encode(), dtype="S32"
        )
        order = np.argsort(bsig)
        tbl = pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 8)[order]),
                "band": pa.array(
                    np.tile(np.arange(8, dtype=np.int32), len(ids))[order]
                ),
                "bsig": pa.array(bsig[order]).cast(pa.string()),
            }
        )
        pq.write_table(tbl, f"{bands_v0}/part-{k:04d}.parquet")
        total += n
    return total


PROBE_REPS = 5


def run_neardup_probe(spark, base: str, s_docs: int) -> dict:
    """Isolate the near-dup probe's DATA TERM (VERDICT r11 "Next round"
    #7): the full-ladder rung measures whole-batch walls, where fixed
    per-batch cost (scheduling + the ~150-bucket docs write) drowns the
    band-history scan at every locally reachable S.  This mode times
    JUST the candidate probe — the (band, bsig) equi-join of one
    100-doc batch's ~800 band rows against the accumulated band state —
    with no writes in the loop, for both state shapes:

      - append-only: full scan of every v{id} append file (the
        between-compactions shape whose cost grows with S);
      - compacted: touched-bucket pruned read of the bsig-bucketed v-1
        tree + the (empty, post-compaction) plain tail — the pruning
        path whose scan volume is O(batch · bucket_size).

    State building mixes synthesis with real derivation (see
    build_synthetic_band_state): real band rows for the 50 probed seed
    contents (the join must FIND them through the real expressions) +
    shape-identical random-hex filler for the rest.  Candidate counts
    are asserted identical across shapes (in practice the planted-dup
    count — the filler provably never matches)."""
    from pyspark.sql import functions as F

    from recsys_mapreduce_mrjob_spark.operators.dedup import (
        portable_band_rows,
        portable_minhash_sig,
    )
    from recsys_mapreduce_mrjob_spark.streaming.twins import (
        band_state_reader,
        compact_neardup_bands,
    )

    state = f"{base}/state"
    bands_dir = f"{state}/bands"
    v0 = f"{bands_dir}/v0"
    half = BATCH_ITEMS // 2
    dup = np.unique((7919 + 104729 * np.arange(half)) % s_docs)

    t0 = time.monotonic()
    n_band_rows = build_synthetic_band_state(v0, s_docs, dup)
    # Real band rows for the probed seed contents, via the real chain.
    _write_neardup_chunk(
        f"{base}/probed_seed.parquet",
        dup,
        [_neardup_text(int(c)) for c in dup],
        time.time(),
    )
    real_seed = portable_band_rows(
        portable_minhash_sig(
            spark.read.parquet(f"{base}/probed_seed.parquet").select(
                "doc_id", "text"
            )
        )
    )
    real_seed.sort("bsig").coalesce(1).write.mode("append").parquet(v0)
    # band_state_paths requires the commit marker Spark's own writes
    # leave; the pyarrow filler files need it added by hand.
    with open(f"{v0}/_SUCCESS", "w") as fh:
        fh.write("")
    seed_sec = time.monotonic() - t0
    n_band_rows += real_seed.count()

    # The probe batch: the ladder's mix (half planted near-dups of seed
    # content, half novel), band rows persisted + materialized exactly
    # as incremental_neardup's upsert does (the broadcast precondition).
    texts = [
        _neardup_text(int(c)).rsplit(" ", 1)[0] + " znear" for c in dup
    ] + [_neardup_text(s_docs + j) for j in range(BATCH_ITEMS - len(dup))]
    _write_neardup_chunk(
        f"{base}/probe.parquet",
        s_docs + np.arange(BATCH_ITEMS),
        texts,
        time.time(),
    )
    pdocs = spark.read.parquet(f"{base}/probe.parquet")
    bands_new = portable_band_rows(
        portable_minhash_sig(pdocs.select("doc_id", "text"))
    ).persist()
    bands_new.count()

    # Deliberately old×new ONLY (no in-batch self-join): the rung
    # isolates the DATA term — how the probe cost scales with the
    # accumulated state — and the new×new tile is a constant that
    # cancels across the two timed shapes.  The production candidate
    # set (band_probe_candidates) adds that tile on top of the SAME
    # state read measured here (band_state_reader — shared, so the
    # pruning semantics cannot drift from what ingestion runs).
    def probe_against(bands_old) -> int:
        ob = bands_old.alias("ob")
        nb = bands_new.alias("nb")
        cand = ob.join(
            nb,
            (F.col("ob.band") == F.col("nb.band"))
            & (F.col("ob.bsig") == F.col("nb.bsig"))
            & (F.col("ob.doc_id") != F.col("nb.doc_id")),
        ).select(
            F.least("ob.doc_id", "nb.doc_id").alias("doc_a"),
            F.greatest("ob.doc_id", "nb.doc_id").alias("doc_b"),
        )
        return cand.distinct().count()

    def timed_probes(read_fn) -> tuple[list, int]:
        times, n = [], -1
        for _ in range(PROBE_REPS):
            t = time.monotonic()
            n = probe_against(read_fn())
            times.append(round(time.monotonic() - t, 3))
        return times, n

    # Shape A: append-only full scan (fresh read each rep; the OS page
    # cache is warm — realistic for recently ingested state).  Both
    # shapes read through band_state_reader: before compaction it
    # resolves to the plain append versions, after to the touched-
    # bucket pruned compacted tree — the exact reads ingestion runs.
    t_append, n_append = timed_probes(
        lambda: band_state_reader(spark, bands_new, bands_dir)
    )

    # Compact (fake the commits log so the batch-built v0 counts as
    # committed), then shape B: touched-bucket pruned read.
    os.makedirs(f"{state}/_checkpoint/commits", exist_ok=True)
    with open(f"{state}/_checkpoint/commits/0", "w") as fh:
        fh.write("")
    band_buckets = max(64, (s_docs * 8) // 1000)
    t0 = time.monotonic()
    compact_neardup_bands(spark, state, n_buckets=band_buckets)
    compact_sec = time.monotonic() - t0

    t_comp, n_comp = timed_probes(
        lambda: band_state_reader(spark, bands_new, bands_dir)
    )
    assert n_comp == n_append, (n_comp, n_append)
    return {
        "mode": "neardup_probe",
        "n_band_rows": n_band_rows,
        "seed_sec": round(seed_sec, 3),
        "compact_sec": round(compact_sec, 3),
        "band_buckets": band_buckets,
        "n_candidates": n_append,
        "append_probe_sec": sorted(t_append)[len(t_append) // 2],
        "append_probe_all": t_append,
        "compacted_probe_sec": sorted(t_comp)[len(t_comp) // 2],
        "compacted_probe_all": t_comp,
    }


def _batch_durations(stamps: list, end: float) -> dict:
    return {
        bid: (stamps[i + 1][1] if i + 1 < len(stamps) else end) - t
        for i, (bid, t) in enumerate(stamps)
    }


def run_neardup_shape(
    spark, base: str, s_docs: int, n_buckets: int, compact: bool
) -> tuple:
    """One near-dup rung shape.  ``compact=False``: drain seed + small
    chunks in one stream (per-batch probes scan the growing append-only
    band history).  ``compact=True``: drain the seed, run
    compact_neardup_bands (band buckets sized so a bucket holds ~1k
    rows), then land the small chunks and resume — per-batch probes
    read only the touched compacted buckets + the small uncompacted
    tail, the production cadence whose per-batch wall should be FLAT
    in S."""
    import shutil as _shutil

    from recsys_mapreduce_mrjob_spark.streaming.twins import (
        compact_neardup_bands,
        incremental_neardup,
    )

    label = "compacted" if compact else "appendonly"
    src = f"{base}/src_{label}"
    state = f"{base}/state_{label}"
    stamps: list = []
    on_batch = lambda bid: stamps.append((bid, time.monotonic()))  # noqa: E731
    if compact:
        build_neardup_source(src, s_docs, part="seed")
        incremental_neardup(spark, src, state, on_batch=on_batch, n_buckets=n_buckets)
        seed_end = time.monotonic()
        t0 = time.monotonic()
        band_buckets = max(64, (s_docs * 8) // 1000)
        compact_neardup_bands(spark, state, n_buckets=band_buckets)
        compact_sec = time.monotonic() - t0
        build_neardup_source(src, s_docs, part="small")
        incremental_neardup(spark, src, state, on_batch=on_batch, n_buckets=n_buckets)
        durs = _batch_durations(stamps, time.monotonic())
        if 0 in durs:  # the seed's duration ends at its own drain
            durs[0] = seed_end - dict(stamps)[0]
    else:
        build_neardup_source(src, s_docs, part="all")
        incremental_neardup(spark, src, state, on_batch=on_batch, n_buckets=n_buckets)
        durs = _batch_durations(stamps, time.monotonic())
        compact_sec = None
    _shutil.rmtree(src, ignore_errors=True)
    small = sorted(d for bid, d in durs.items() if bid >= 1)
    out = {
        "n_batches": len(durs),
        "seed_batch_sec": round(durs.get(0, float("nan")), 3),
        "small_batch_med_sec": round(small[len(small) // 2], 3),
        "small_batch_sec": [round(d, 3) for d in small],
        "n_buckets": n_buckets,
    }
    if compact_sec is not None:
        out["compact_sec"] = round(compact_sec, 3)
        out["band_buckets"] = band_buckets
    return out, state


def run_shape(
    spark, src: str, state: str, n_buckets: int, mode: str = "stats"
) -> dict:
    from recsys_mapreduce_mrjob_spark.streaming.twins import (
        incremental_doc_dedup,
        incremental_item_stats,
        incremental_scd2,
    )

    # The near-dup ladder routes through run_neardup_shape (it needs the
    # seed/small source builder and the optional compaction step); this
    # generic dispatcher handles only the ratings/docs-schema folds
    # (ADVICE r11: a "neardup" entry here was unreachable dead code).
    fn = {
        "stats": incremental_item_stats,
        "scd2": incremental_scd2,
        "docs": incremental_doc_dedup,
    }[mode]
    stamps: list[tuple[int, float]] = []
    fn(
        spark,
        src,
        state,
        on_batch=lambda bid: stamps.append((bid, time.monotonic())),
        n_buckets=n_buckets,
    )
    end = time.monotonic()
    durs = {
        bid: (stamps[i + 1][1] if i + 1 < len(stamps) else end) - t
        for i, (bid, t) in enumerate(stamps)
    }
    small = sorted(d for bid, d in durs.items() if bid >= 1)
    return {
        "n_batches": len(durs),
        "seed_batch_sec": round(durs.get(0, float("nan")), 3),
        "small_batch_med_sec": round(small[len(small) // 2], 3),
        "small_batch_sec": [round(d, 3) for d in small],
    }


def main() -> None:
    args = sys.argv[1:]
    mode = "stats"
    if "--scd2" in args:
        mode = "scd2"
        args.remove("--scd2")
    if "--docs" in args:
        mode = "docs"
        args.remove("--docs")
    if "--neardup-probe" in args:
        mode = "neardup_probe"
        args.remove("--neardup-probe")
    elif "--neardup" in args:
        mode = "neardup"
        args.remove("--neardup")
    if mode == "neardup_probe":
        # Probe-isolation rungs take bare S (no bucket arg — the docs
        # state never enters the measurement).
        rungs = [
            (int(a), 0) for a in args
        ] or [(160_000, 0), (640_000, 0), (2_560_000, 0)]
    else:
        rungs = (
            [tuple(int(x) for x in a.split(":")) for a in args]
            if args
            else (NEARDUP_RUNGS if mode == "neardup" else RUNGS)
        )

    from recsys_mapreduce_mrjob_spark.session import session_builder
    from recsys_mapreduce_mrjob_spark.streaming.twins import (
        read_bucketed_state,
    )

    spark = (
        session_builder(
            master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
            shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        )
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for s_items, n_buckets in rungs:
        base = tempfile.mkdtemp(prefix=f"state_ingest_{s_items}_")
        try:
            src = f"{base}/src"
            out: dict[str, dict] = {"mode": mode}
            states = {}
            if mode == "neardup_probe":
                out = run_neardup_probe(spark, base, s_items)
                spark.catalog.clearCache()
                results[str(s_items)] = out
                print(f"S={s_items}: {json.dumps(out)}", flush=True)
                continue
            if mode == "neardup":
                # Two shapes, both append-only bands: with and without
                # the mid-stream compaction (the production cadence).
                for compact in (False, True):
                    label = "compacted" if compact else "appendonly"
                    out[label], states[label] = run_neardup_shape(
                        spark, base, s_items, n_buckets, compact
                    )
            else:
                if mode == "stats":
                    build_source(src, s_items)
                elif mode == "scd2":
                    build_event_source(src, s_items)
                else:
                    build_doc_source(src, s_items)
                for label, nb in (("bucketed", n_buckets), ("full_rewrite", 1)):
                    state = f"{base}/state_{label}"
                    out[label] = run_shape(spark, src, state, nb, mode)
                    out[label]["n_buckets"] = nb
                    states[label] = state

            def _state_rows(state: str):
                sub = f"{state}/docs" if mode == "neardup" else state
                df = read_bucketed_state(spark, sub)
                if mode == "neardup":
                    # sh_set is an (order-nondeterministic) array; the
                    # graded projection is the keeper decision.
                    df = df.select("doc_id", "lang", "source", "dropped")
                return sorted(map(tuple, df.collect()))

            labels = list(states)
            rows_a = _state_rows(states[labels[0]])
            if len(labels) > 1:
                rows_b = _state_rows(states[labels[1]])
                out["end_state_identical"] = rows_a == rows_b
            out["state_rows"] = len(rows_a)
            results[str(s_items)] = out
            print(f"S={s_items}: {json.dumps(out)}", flush=True)
        finally:
            shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"rungs": results, "batch_items": BATCH_ITEMS}))
    spark.stop()


if __name__ == "__main__":
    main()
