"""Committed bench program-cache artifacts must match HEAD.

CLAUDE.md invariant (violated in rounds 3 AND 4, costing round 4 its entire
driver-verified perf capture — BENCH_r04.json rc=124 on program-cache misses):
after ANY change to the package files hashed by ``bench.py::code_tag``, the
full ``python bench.py`` must be re-run on TPU and the regenerated
``benchmarks/cache/*.jaxprog`` artifacts committed.  This test recomputes the
exact cache keys bench.py will use at HEAD (code hash + per-preset options
fingerprint) and FAILS when the committed artifacts are missing — so a core
edit goes red until the bench is re-run, and a stale-cache driver timeout
cannot recur (round-4 verdict, next-round item 1b).
"""

import glob
import hashlib
import importlib.util
import os
import types

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE_DIR = os.path.join(REPO, "benchmarks", "cache")


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _opt_tag(bench, preset):
    args = types.SimpleNamespace(early_cap=None, mct=None, fk=None)
    opts = bench.preset_options(preset, args)
    return hashlib.sha256(repr(opts).encode()).hexdigest()[:6]


def _require(prefix, tags, what):
    missing = [
        t for t in tags
        if not glob.glob(os.path.join(CACHE_DIR, f"{prefix}_{t}.*.jaxprog"))
    ]
    assert not missing, (
        f"committed program-cache artifacts for {what} are STALE at HEAD: "
        f"missing {[f'{prefix}_{t}' for t in missing]} in benchmarks/cache/. "
        "A package file hashed by bench.py::code_tag changed since the last "
        "full bench run.  Re-run `python bench.py` on TPU (and `python "
        "bench.py --quick` for the B64 smoke artifacts), then commit the "
        "regenerated benchmarks/cache/*.jaxprog and benchmarks/BENCH_*.json "
        "(CLAUDE.md re-run rule; round-4 verdict item 1)."
    )


def test_code_tag_is_semantic(tmp_path):
    """bench.py::code_tag hashes docstring-stripped ASTs: comment/docstring
    edits of package files must NOT invalidate the committed bench
    artifacts (three same-day TPU re-runs in round 5 motivated this), while
    any actual code change must.  Runs against a scratch package tree —
    mutating the real sources would race other xdist workers."""
    bench = _load_bench()
    pkg = tmp_path / "pkg"
    core = pkg / "core"
    core.mkdir(parents=True)
    mod = core / "mod.py"
    src = '"""Docstring."""\n\ndef f(x):\n    """f doc."""\n    return x + 1\n'
    mod.write_text(src)
    tag0 = bench.code_tag(pkg=str(pkg))
    mod.write_text(src + "\n# a comment\n")
    assert bench.code_tag(pkg=str(pkg)) == tag0, "comment edit changed the tag"
    mod.write_text(src.replace('"""Docstring."""', '"""Edited docstring."""'))
    assert bench.code_tag(pkg=str(pkg)) == tag0, "docstring edit changed the tag"
    mod.write_text(src + "_probe = 1\n")
    assert bench.code_tag(pkg=str(pkg)) != tag0, "code edit kept the tag"
    # and the real package's tag matches the committed records (same check
    # as test_committed_bench_records_match_head, asserted here against the
    # default-root path to pin that the pkg= override defaults correctly)
    import json

    with open(os.path.join(REPO, "benchmarks", "BENCH_tuned.json")) as f:
        assert json.load(f)["code_tag"] == bench.code_tag()


def test_bench_cli_override_mapping():
    """--early-cap 0 must mean the UNCAPPED schedule (Options wants None —
    the no-cap control the tuned preset was swept against), and --min-step
    must reach Options.min_step_size; both alter the options fingerprint so
    experiments can never serve canonical cache artifacts."""
    bench = _load_bench()
    base = types.SimpleNamespace(early_cap=None, mct=None, fk=None,
                                 min_step=None)
    tuned = bench.preset_options("tuned", base)
    assert tuned.early_round_iteration_cap == 20  # the swept-in default
    nocap = bench.preset_options(
        "tuned",
        types.SimpleNamespace(early_cap=0, mct=None, fk=None, min_step=None),
    )
    assert nocap.early_round_iteration_cap is None
    grid = bench.preset_options(
        "tuned",
        types.SimpleNamespace(early_cap=None, mct=None, fk=None,
                              min_step=1.6e-2),
    )
    assert grid.min_step_size == pytest.approx(1.6e-2)
    assert grid.num_step_sizes == 6
    for other in (nocap, grid):
        a = hashlib.sha256(repr(tuned).encode()).hexdigest()[:6]
        b = hashlib.sha256(repr(other).encode()).hexdigest()[:6]
        assert a != b


@pytest.mark.parametrize("preset", ["tuned", "parity"])
def test_full_bench_artifacts_match_head(preset):
    """The driver config (bench.py CANONICAL_BATCH): init/first-chunk/finish
    programs must exist at HEAD's code hash for BOTH presets."""
    bench = _load_bench()
    ctag = bench.code_tag()
    B = bench.CANONICAL_BATCH
    prefix = f"bench_acrobot_T101_B{B}_f32_{preset}_{_opt_tag(bench, preset)}_{ctag}"
    _require(
        prefix, [f"init_B{B}", f"chunkv_B{B}", f"finish_B{B}"],
        f"the full bench ({preset} preset, B={B})",
    )


def test_quick_bench_artifacts_match_head():
    """B=64 (the --quick smoke config, parity preset — bench.py's --quick
    default): the smoke run must hit the committed cache too (ADVICE r4)."""
    bench = _load_bench()
    ctag = bench.code_tag()
    prefix = f"bench_acrobot_T101_B64_f32_parity_{_opt_tag(bench, 'parity')}_{ctag}"
    _require(
        prefix, ["init_B64", "chunkv_B1024"],
        "the --quick bench (parity preset, B=64)",
    )


def test_committed_bench_records_match_head():
    """benchmarks/BENCH_{tuned,parity}.json must carry HEAD's code_tag —
    README/PARITY quote these numbers as current, so a record measured at a
    stale hash is a doc-integrity bug (round-4 verdict, weak item 5)."""
    import json

    bench = _load_bench()
    ctag = bench.code_tag()
    for preset in ("tuned", "parity"):
        path = os.path.join(REPO, "benchmarks", f"BENCH_{preset}.json")
        assert os.path.exists(path), f"missing committed record {path}"
        with open(path) as f:
            rec = json.load(f)
        assert rec.get("code_tag") == ctag, (
            f"benchmarks/BENCH_{preset}.json was measured at code_tag "
            f"{rec.get('code_tag')!r} but HEAD hashes to {ctag!r} — re-run "
            "`python bench.py` on TPU and commit the refreshed records "
            "(CLAUDE.md re-run rule)."
        )
        assert "overrides" not in rec, (
            "committed record carries non-default overrides — it must be "
            "regenerated by a canonical (no-flag) `python bench.py` run"
        )
        assert rec.get("batch") == bench.CANONICAL_BATCH, (
            f"committed record measured at batch {rec.get('batch')} but the "
            f"canonical protocol batch is {bench.CANONICAL_BATCH}"
        )
