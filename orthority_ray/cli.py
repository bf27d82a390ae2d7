"""Command-line interface — the engine's analog of the reference's ``oty``
CLI (`orthority/cli.py:294-372`: sub-commands sharing one backend).

    python -m orthority_ray flagship --sf-dir DIR --out DIR [--no-resume]
    python -m orthority_ray query NAME --sf-dir DIR [--limit N]
    python -m orthority_ray tiles --sf-dir DIR
    python -m orthority_ray refine --method shift|shift_drift
    python -m orthority_ray list

Owns its Ray session (guarded init; the library never calls ray.init)."""

from __future__ import annotations

import argparse
import sys


def _ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False


def cmd_flagship(args) -> int:
    _ray_session()
    from .pipelines.flagship import run_flagship

    man = run_flagship(args.sf_dir, args.out, n_parts=args.parts, resume=not args.no_resume)
    print(man.to_string(index=False))
    return 0


def cmd_dedup(args) -> int:
    _ray_session()
    from .stages.dedup import write_dedup_layout

    man = write_dedup_layout(args.sf_dir, args.out, n_parts=args.parts,
                             resume=not args.no_resume)
    print(man.to_string(index=False))
    return 0


def cmd_query(args) -> int:
    _ray_session()
    import pandas as pd
    import pyarrow as pa
    import ray.data

    sys.path.insert(0, args.repo_root)
    import __ray_entry__ as E

    qs = E.queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    from .stages.hashjoin import last_plans

    last_plans(clear=True)  # scope the join-plan telemetry to this query
    res = qs[args.name](args.sf_dir)
    ds = res if isinstance(res, ray.data.Dataset) else None
    if ds is not None:
        # keep the EXECUTED dataset for --stats: limit() copies the plan,
        # so calling stats() on the unlimited base printed "" (r3 review)
        if args.limit:
            ds = ds.limit(args.limit)
        res = ds.to_pandas()
    else:
        if isinstance(res, pa.Table):
            res = res.to_pandas()
        if args.limit:
            res = res.head(args.limit)
    print(res.to_string(index=False))
    if getattr(args, "stats", False):
        # per-stage wall/CPU/rows from Ray Data's executor — the profiling
        # loop the scale tuning in BASELINE.md was driven by
        if ds is not None:
            print("\n--- ds.stats() ---\n" + ds.stats())
        else:
            print("\n(stats: query returned a driver-side frame, "
                  "no Dataset plan to report)")
        # adaptive-join decisions (r3 verdict #8): a 10^9-row side that got
        # mis-sampled into a broadcast shows up HERE, not as an OOM later
        for p in last_plans():
            print(f"--- join plan: key={p['key']} how={p['how']} "
                  f"strategy={p['strategy']} "
                  f"right_total_est={p['right_total_est']} "
                  f"n_buckets={p['n_buckets']} hot_keys={p['n_hot']}")
    return 0


def cmd_tiles(args) -> int:
    _ray_session()
    from .sources.pages import read_page_keys
    from .stages.geocode import geocode
    from .stages.tiles import assign_tiles

    print(assign_tiles(geocode(read_page_keys(args.sf_dir))).to_string(index=False))
    return 0


def cmd_refine(args) -> int:
    _ray_session()
    import ray.data

    from .sources import param_io as P
    from .stages.refine import make_gcp_table, refine_rpc_grouped

    gcps = make_gcp_table(P.RPC)
    out = refine_rpc_grouped(ray.data.from_pandas(gcps), P.RPC, args.method).to_pandas()
    print(out.to_string(index=False))
    return 0


def cmd_sharpen(args) -> int:
    """Two-phase Gram-Schmidt sharpen over the geocoded pages (the `oty
    sharpen` analog)."""
    _ray_session()
    from .sources.pages import read_page_keys
    from .stages.geocode import geocode
    from .stages.sharpen import pan_sharpen

    out = pan_sharpen(geocode(read_page_keys(args.sf_dir))).limit(args.limit).to_pandas()
    cols = ["doc_id", "pan", "ms0", "sharp_ms0", "sharp_ms1", "sharp_ms2"]
    print(out[cols].to_string(index=False))
    return 0


def cmd_calibrate(args) -> int:
    """Per-image DLT calibration demo (the `oty`-fit analog)."""
    _ray_session()
    import ray.data

    from .stages.fit import calibrate_grouped, calibration_frames

    out = calibrate_grouped(ray.data.from_pandas(calibration_frames())).to_pandas()
    print(out.to_string(index=False))
    return 0


def cmd_list(args) -> int:
    sys.path.insert(0, args.repo_root)
    import __ray_entry__ as E

    oracle = set(E.oracle_sql())
    for name in sorted(E.queries()):
        kind = "oracle-checked" if name in oracle else "rows-only"
        print(f"{name:24s} {kind}")
    return 0


def cmd_ingest(args) -> int:
    """Incremental multi-file ingest: read only files not yet in the
    manifest, append them to a partitioned parquet sink, commit."""
    _ray_session()
    from .sources.ingest import incremental_ingest

    new, ds, commit, bad = incremental_ingest(args.input, args.state)
    if bad:
        print(f"ingest: quarantined {len(bad)} unreadable file(s)")
    if not new:
        commit()  # record quarantined files even when nothing is readable
        print("ingest: nothing new")
        return 0
    if args.out:
        ds.write_parquet(args.out)
    n = ds.count() if args.out is None else None
    commit()
    print(f"ingest: {len(new)} new file(s)"
          + (f", {n} rows" if n is not None else f" -> {args.out}"))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="orthority_ray")
    p.add_argument("--repo-root", default="/root/repo")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("flagship", help="run/resume the flagship pipeline")
    f.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    f.add_argument("--out", required=True)
    f.add_argument("--parts", type=int, default=16)
    f.add_argument("--no-resume", action="store_true")
    f.set_defaults(fn=cmd_flagship)

    d = sub.add_parser("dedup", help="run/resume the dedup-corpus layout")
    d.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    d.add_argument("--out", required=True)
    d.add_argument("--parts", type=int, default=16)
    d.add_argument("--no-resume", action="store_true")
    d.set_defaults(fn=cmd_dedup)

    q = sub.add_parser("query", help="run a named query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--limit", type=int, default=20)
    q.add_argument("--stats", action="store_true",
                   help="print ds.stats() (per-stage wall/rows) after the result")
    q.set_defaults(fn=cmd_query)

    t = sub.add_parser("tiles", help="print the cell -> tile routing table")
    t.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    t.set_defaults(fn=cmd_tiles)

    r = sub.add_parser("refine", help="grouped RPC refinement demo")
    r.add_argument("--method", default="shift", choices=["shift", "shift_drift"])
    r.set_defaults(fn=cmd_refine)

    sh = sub.add_parser("sharpen", help="Gram-Schmidt pan-sharpen demo")
    sh.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sh.add_argument("--limit", type=int, default=10)
    sh.set_defaults(fn=cmd_sharpen)

    c = sub.add_parser("calibrate", help="per-image DLT calibration demo")
    c.set_defaults(fn=cmd_calibrate)

    l = sub.add_parser("list", help="list queries")
    l.set_defaults(fn=cmd_list)

    ig = sub.add_parser(
        "ingest", help="incremental multi-file/URL ingest with a manifest")
    ig.add_argument("--input", required=True,
                    help="path / glob / directory / fsspec URL of parquet")
    ig.add_argument("--state", required=True,
                    help="manifest directory (tracks ingested files)")
    ig.add_argument("--out", default=None,
                    help="optional partitioned parquet sink")
    ig.set_defaults(fn=cmd_ingest)

    args = p.parse_args(argv)
    import ray

    # only tear down a session THIS invocation created: an in-process caller
    # (tests, a host app) keeps its own Ray session — shutting it down here
    # left later work to auto-reinit at full width, silently changing
    # cluster-size-dependent decisions like config.should_materialize
    owned = not ray.is_initialized()
    rc = args.fn(args)
    if owned and ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
