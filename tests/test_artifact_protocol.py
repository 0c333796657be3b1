"""Artifact-protocol guard (VERDICT r7 item 2): the committed driver-sim
artifacts must cover EXACTLY the keys the live registry ships.

r7 shipped a 310-key registry with 309-key sims because
dedup_substring_apply was committed after the end-of-round artifact
regeneration — committed evidence that no longer matched the shipped
surface. This test makes that impossible to commit silently: it compares
the NEWEST CORRECTNESS_local_r*.json (and BENCH_DETAIL.md's key rows)
against __spark_entry__.queries() and fails with the delta spelled out.

Mid-round this test goes red the moment a key is added — that is the
point: the red is the reminder that the end-of-round regeneration (verify
skill, END-OF-ROUND RULE) has not run on final code yet.
"""

from __future__ import annotations

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry_keys() -> set[str]:
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    return set(E.queries())


def _latest_sim_path() -> str | None:
    best, best_n = None, -1
    for name in os.listdir(REPO):
        m = re.fullmatch(r"CORRECTNESS_local_r(\d+)\.json", name)
        if m and int(m.group(1)) > best_n:
            best, best_n = name, int(m.group(1))
    return os.path.join(REPO, best) if best else None


def test_latest_sim_covers_registry_exactly():
    path = _latest_sim_path()
    if path is None:
        pytest.skip("no committed driver-sim artifact yet")
    with open(path) as fh:
        sim = json.load(fh)
    sim_keys = set(sim["keys"])
    reg_keys = _registry_keys()
    missing = sorted(reg_keys - sim_keys)
    extra = sorted(sim_keys - reg_keys)
    assert not missing and not extra, (
        f"{os.path.basename(path)} does not match the live registry — "
        f"regenerate the sims on final code (verify skill END-OF-ROUND "
        f"RULE). keys in registry but not sim: {missing}; "
        f"keys in sim but not registry: {extra}"
    )


def test_bench_detail_covers_registry_exactly():
    path = os.path.join(REPO, "BENCH_DETAIL.md")
    if not os.path.exists(path):
        pytest.skip("no BENCH_DETAIL.md yet")
    keys = set()
    with open(path) as fh:
        for line in fh:
            # rows cell may carry the transfer-bound marker (" †", r12)
            m = re.match(r"\| (\w+) \| [\d.]+ \| \d+( †)? \|", line)
            if m:
                keys.add(m.group(1))
    if not keys:
        pytest.skip("BENCH_DETAIL.md has no per-key rows to check")
    reg_keys = _registry_keys()
    missing = sorted(reg_keys - keys)
    assert not missing, (
        f"BENCH_DETAIL.md is missing registry keys {missing} — regenerate "
        f"it from scratch on final code (rm the partial first)"
    )


def _git(args: list[str]) -> str:
    import subprocess

    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


def test_artifacts_postdate_last_source_commit():
    """VERDICT r8 item (process): "artifacts last" must mean LAST —
    including refactors. r8's final snapshot edited pipeline/cluster.py 70
    minutes AFTER the sims were regenerated (harmless that time, verified
    by diff — but the r7 breach was exactly this shape). This guard fails
    whenever any commit touching upflow_spark/ is NEWER than the commit
    that last touched the newest driver-sim artifact, or when upflow_spark/
    has uncommitted changes: either means the committed evidence no longer
    describes the shipped source. Mid-round red is by design."""
    path = _latest_sim_path()
    if path is None:
        pytest.skip("no committed driver-sim artifact yet")
    dirty = _git(["status", "--porcelain", "--", "upflow_spark"])
    assert not dirty, (
        "upflow_spark/ has uncommitted changes newer than the committed "
        f"sims — regenerate artifacts on final code:\n{dirty}"
    )
    art_ts = _git(["log", "-1", "--format=%ct", "--", os.path.basename(path)])
    src_ts = _git(["log", "-1", "--format=%ct", "--", "upflow_spark"])
    if not art_ts or not src_ts:
        pytest.skip("artifact or source not in git history yet")
    assert int(src_ts) <= int(art_ts), (
        f"upflow_spark/ was committed at {src_ts}, AFTER the newest sims "
        f"artifact ({os.path.basename(path)} at {art_ts}) — rerun the "
        "end-of-round regeneration (verify skill) on final code"
    )


def test_rows_only_keys_all_justified_in_survey():
    """Every registered key WITHOUT an oracle must appear in SURVEY §2's
    rows-only appendix (and nothing extra) — the untested-hash surface
    stays auditable as the registry grows (VERDICT r10 item 7)."""
    import re

    import upflow_spark  # noqa: F401
    from upflow_spark.registry import ORACLE, QUERIES

    rows_only = set(QUERIES) - set(ORACLE)
    survey = open(os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")).read()
    m = re.search(
        r"### §2 Appendix — rows-only keys.*?\n(\|.*?)\n\n", survey, re.S
    )
    assert m, "rows-only appendix table missing from SURVEY.md"
    listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", m.group(1), re.M))
    assert listed == rows_only, (
        f"appendix out of sync: missing={sorted(rows_only - listed)} "
        f"stale={sorted(listed - rows_only)}"
    )
