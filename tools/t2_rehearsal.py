"""Full t2 dress rehearsal: the driver's correctness sweep, simulated.

Runs from ANY cwd in a fresh process with a deliberately hostile session
(non-UTC timezone, 200 shuffle partitions — the driver owns its own
SparkSession, so the contract boundary in ``__spark_entry__`` must cope):
``entry()`` smoke, then EVERY ``queries()`` entry compared against
``oracle_sql()`` through DuckDB with tests/parity.py's normalization.

Usage:  python /root/repo/tools/t2_rehearsal.py  [sf_dir]  [--prefix N]
Exit 0 = every query green; 1 = failures listed on stdout.

``--prefix N`` restricts the sweep to the first N registered queries —
the driver's ACTUAL per-round load (it grades a 50-slot prefix).  The
full 167-query sweep accumulates more session-resident state (memoized
relations, fixpoint checkpoints) than the driver ever holds; at 167
queries it overflows the bare 1g heap (~query 113, round 10), so the
FULL sweep defaults the driver JVM to 4g while ``--prefix 50`` keeps
the bare heap — together they cover both realities: the driver's exact
bare-session load, and every registered query end-to-end.

Round-3 observations for budgeting: the full 119-query sweep took ~140 s
at sf0.01 on local[32]; the Python-worker queries (mapInPandas /
applyInPandas) are the ones that break first under a foreign cwd — they
need ``_ship_package``'s zip shipping, which pytest-from-repo-root never
exercises (see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = sys.argv[1:]
    prefix = None
    if "--prefix" in args:
        i = args.index("--prefix")
        prefix = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "200")
        .config("spark.ui.enabled", "false")
    )
    # The hostile simulation keeps the BARE default heap (the point is the
    # conf boundary, and the driver's own sweep runs at sf0.01, where 1g
    # suffices).  At sf0.1 the flagship's 13M-row aggregation OOMs a 1g
    # JVM and every later query reads "connection refused" — export
    # SPARK_GRAFT_T2_DRIVER_MEMORY=16g for the local deep sweep.
    # Heap policy (round 10): a --prefix run simulates the driver's real
    # per-round load and stays BARE; the full-registry sweep holds ~3×
    # the driver's session-resident state and gets 4g by default (see
    # module docstring).  Env override wins either way.
    mem = os.environ.get("SPARK_GRAFT_T2_DRIVER_MEMORY") or (
        None if prefix is not None else "4g"
    )
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    assert E.entry(spark).collect(), "entry() returned no rows"

    from tests.parity import compare

    qs, osql = E.queries(), E.oracle_sql()
    if prefix is not None:
        qs = {n: qs[n] for n in list(qs)[:prefix]}
    print(
        f"queries={len(qs)} oracles={len(osql)} sf_dir={sf_dir} "
        f"prefix={prefix} heap={mem or 'bare'}",
        flush=True,
    )
    fails: list[str] = []
    t_start = time.monotonic()
    for i, name in enumerate(qs):
        try:
            compare(spark, name, qs[name], osql.get(name), sf_dir)
        except Exception:
            fails.append(name)
            traceback.print_exc()
            print(f"[{i + 1}/{len(qs)}] {name}: FAIL", flush=True)
        if (i + 1) % 20 == 0:
            print(f"[{i + 1}/{len(qs)}] ... ok so far", flush=True)
    print(
        f"done in {time.monotonic() - t_start:.0f}s; failures: {fails or 'NONE'}"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
