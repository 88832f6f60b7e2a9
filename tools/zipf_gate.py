#!/usr/bin/env python3
"""Standing duplicate-skew (Zipf) correctness gate.

The r8 skew sweep caught the round's one real scale defect (quadratic CC
over expanded member pairs), so the dedup/span/similarity family runs on a
Zipfian fixture EVERY round, not just when skew is suspected.

Usage: python3 tools/zipf_gate.py [round_tag] [src_sf_dir] [work_dir]
  e.g. python3 tools/zipf_gate.py r09

Steps (all idempotent, serialized — do NOT run beside another sbt/bench):
  1. build the zipf fixture from src_sf_dir (default /root/testdata/sf0.1,
     ~43k docs, hottest duplicate group ~5k copies, row_group=10000)
  2. sbt runMain graft.Verify on the fixture, SPARK_GRAFT_ONLY=<family>
  3. one check.py process PER QUERY (600s cap, optional memory cap via
     GRAFT_CHECK_MEMLIMIT) so a pathological oracle can't sink the sweep
  4. write CORRECTNESS_<round_tag>_zipf.json next to this repo's other
     round artifacts

A DuckDB timeout records ORACLE-INFEASIBLE (engine output was produced;
the oracle ran out of resources), never a failure; any hash mismatch is a
FAIL and exits nonzero.
"""
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAMILY = [
    "q_ann_ivf", "q_ann_lsh", "q_ann_lsh_mp", "q_curate",
    "q_dedup_clusters", "q_dedup_exact", "q_dedup_incremental",
    "q_dedup_minhash", "q_dup_span_removal", "q_dup_spans",
    "q_fingerprint", "q_levenshtein", "q_ngram_jaccard",
    "q_pack_sequences", "q_salted_distinct", "q_semdedup", "q_simhash",
    "q_simhash_pairs", "q_winnow_pairs",
]

ORACLE_TIMEOUT_S = int(os.environ.get("GRAFT_ZIPF_ORACLE_TIMEOUT", "600"))

# Queries whose committed oracle (recursive-CTE closure) is infeasible on
# the clique-dense zipf pair graph: verified through the equivalent
# pinned/iterative recipe instead (tools/pinned_check.py; recipes are
# cross-validated against the committed oracles at sf0.01/sf0.1).
PINNED = {"q_dedup_clusters", "q_semdedup"}
PINNED_TIMEOUT_S = int(os.environ.get("GRAFT_ZIPF_PINNED_TIMEOUT", "3600"))


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    return subprocess.run(cmd, **kw)


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "rXX"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    work = sys.argv[3] if len(sys.argv) > 3 else "/tmp/zipf_gate"
    fixture = f"{work}/sfzipf"
    out = f"{work}/verify_out"
    os.makedirs(work, exist_ok=True)

    if not os.path.exists(f"{fixture}/documents.parquet"):
        r = run(["python3", f"{REPO}/tools/make_zipf_fixture.py", src,
                 fixture, "43000"])
        if r.returncode != 0:
            sys.exit("fixture build failed")

    shutil.rmtree(out, ignore_errors=True)
    env = dict(os.environ, SPARK_GRAFT_ONLY=",".join(FAMILY),
               SPARK_GRAFT_EXPORT_MODELS="1")
    r = run(["sbt", "-batch", f"runMain graft.Verify {fixture} {out}"],
            cwd=REPO, env=env)
    if r.returncode != 0:
        sys.exit("Verify failed")

    # STANDING cross-validation: before trusting any pinned recipe at this
    # scale, prove recipe == COMMITTED oracle at a scale where both run
    # (sf0.01). A drifted/poisoned recipe fails the whole gate here — the
    # pinned slots can never pass silently on a recipe that no longer
    # matches the committed semantics. (Skip knob for local iteration
    # only: GRAFT_SKIP_XVAL=1.)
    if os.environ.get("GRAFT_SKIP_XVAL") != "1":
        xval_sf = os.environ.get("GRAFT_XVAL_SF", "/root/testdata/sf0.01")
        xval_out = f"{work}/xval_out"
        shutil.rmtree(xval_out, ignore_errors=True)
        xenv = dict(os.environ, SPARK_GRAFT_ONLY=",".join(sorted(PINNED)),
                    SPARK_GRAFT_EXPORT_MODELS="1")
        r = run(["sbt", "-batch",
                 f"runMain graft.Verify {xval_sf} {xval_out}"],
                cwd=REPO, env=xenv)
        if r.returncode != 0:
            sys.exit("cross-validation Verify failed")
        for q in sorted(PINNED):
            r = run(["python3", f"{REPO}/tools/pinned_check.py", xval_sf,
                     xval_out, q, "--cross-validate", "--timeout", "900"])
            if r.returncode != 0:
                sys.exit(f"XVAL-FAIL {q}: pinned recipe no longer matches "
                         f"the committed oracle at {xval_sf} — refusing to "
                         "use it as a scale oracle. Fix the recipe (or the "
                         "committed oracle) before re-running the gate.")
            print(f"XVAL-OK  {q} (recipe == committed oracle at {xval_sf})",
                  flush=True)

    queries, n_pass, n_inf, n_fail, n_noorc = {}, 0, 0, 0, 0
    for q in FAMILY:
        if q in PINNED:
            import time
            t0 = time.time()
            try:
                r = subprocess.run(
                    ["python3", f"{REPO}/tools/pinned_check.py", fixture,
                     out, q, "--timeout", str(PINNED_TIMEOUT_S)],
                    capture_output=True, text=True,
                    timeout=PINNED_TIMEOUT_S + 120)
                dt = int(time.time() - t0)
                line = next((l for l in r.stdout.strip().splitlines()
                             if l.startswith(("PASS", "MISMATCH",
                                              "INFEASIBLE", "NO-CONVERGE"))),
                            r.stdout.strip()[-200:])
                if r.returncode == 0:
                    verdict = line.split()[0]  # PASS-ITER-CLOSURE etc.
                    n_pass += 1
                elif r.returncode == 2:
                    verdict = "ORACLE-INFEASIBLE"
                    n_inf += 1
                else:
                    verdict = "FAIL"
                    n_fail += 1
                queries[q] = {"verdict": verdict,
                              "detail": f"{line.split(q)[-1].strip()} [{dt}s]"}
            except subprocess.TimeoutExpired:
                n_inf += 1
                queries[q] = {"verdict": "ORACLE-INFEASIBLE",
                              "detail": f"pinned oracle exceeded "
                                        f"{PINNED_TIMEOUT_S}s"}
            print(f"{queries[q]['verdict']}  {q} {queries[q]['detail']}",
                  flush=True)
            continue
        # a FAMILY query with no committed oracle must surface as its own
        # NO-ORACLE verdict (and fail the gate), never be laundered into
        # PASS via check.py's SKIP-then-exit-0 path
        oracle = json.load(open(f"{out}/oracle_sql.json"))
        if q not in oracle:
            n_noorc += 1
            queries[q] = {"verdict": "NO-ORACLE",
                          "detail": "query missing from oracle_sql.json — "
                                    "unverifiable, counted as a gate failure"}
            print(f"NO-ORACLE  {q}", flush=True)
            continue
        qdir = f"{work}/chk_{q}"
        shutil.rmtree(qdir, ignore_errors=True)
        os.makedirs(qdir)
        os.symlink(f"{out}/{q}", f"{qdir}/{q}")
        json.dump({q: oracle[q]}, open(f"{qdir}/oracle_sql.json", "w"))
        try:
            import time
            t0 = time.time()
            r = subprocess.run(
                ["python3", f"{REPO}/tools/check.py", fixture, qdir],
                capture_output=True, text=True, timeout=ORACLE_TIMEOUT_S)
            dt = int(time.time() - t0)
            tail = r.stdout.strip().splitlines()
            line = next((l for l in tail if l.startswith(("PASS", "FAIL",
                                                          "SKIP"))), "")
            if line.startswith("SKIP"):
                # check.py skipped (e.g. result parquet missing): that is
                # an unverified query, not a PASS
                verdict = "NO-ORACLE"
                n_noorc += 1
            elif r.returncode == 0:
                verdict = "PASS"
                n_pass += 1
            else:
                verdict = "FAIL"
                n_fail += 1
            queries[q] = {"verdict": verdict,
                          "detail": f"{line.split(q)[-1].strip()} [{dt}s]"}
        except subprocess.TimeoutExpired:
            n_inf += 1
            queries[q] = {
                "verdict": "ORACLE-INFEASIBLE",
                "detail": f"DuckDB oracle exceeded its {ORACLE_TIMEOUT_S}s "
                          "cap; hash-verified at sf0.01/sf0.1"}
        print(f"{queries[q]['verdict']}  {q} {queries[q]['detail']}",
              flush=True)
        shutil.rmtree(qdir, ignore_errors=True)

    doc = {
        "fixture": f"{fixture} (make_zipf_fixture.py of {src}, ~43k docs, "
                   "power-law duplicate skew, row_group=10000)",
        "note": "standing per-round skew gate: dedup/span/similarity "
                "family on a Zipfian duplicate distribution",
        "summary": {"PASS": n_pass, "ORACLE-INFEASIBLE": n_inf,
                    **({"FAIL": n_fail} if n_fail else {}),
                    **({"NO-ORACLE": n_noorc} if n_noorc else {})},
        "mismatches": n_fail,
        "queries": dict(sorted(queries.items())),
    }
    dst = f"{REPO}/CORRECTNESS_{tag}_zipf.json"
    json.dump(doc, open(dst, "w"), indent=1)
    print(f"\nwrote {dst}: {doc['summary']}")
    sys.exit(1 if (n_fail or n_noorc) else 0)


if __name__ == "__main__":
    main()
