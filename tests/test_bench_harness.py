"""Unit tests for bench.py's crash-proofing harness (VERDICT r2 item 1).

The driver runs `python bench.py` on real TPU at the end of every round and
the round's perf story lives or dies on that one JSON line, so the pieces
that make it crash-proof — atomic incremental state, phase-child error
capture, the always-emit merge — get direct unit coverage here. No jax, no
TPU: these exercise only the host-side harness.
"""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_update_state_merges_incrementally(tmp_path):
    path = str(tmp_path / "state.json")
    bench._update_state(path, {"a": 1})
    bench._update_state(path, {"b": 2})
    bench._update_state(path, {"a": 3})
    with open(path) as f:
        assert json.load(f) == {"a": 3, "b": 2}


def test_update_state_survives_corrupt_file(tmp_path):
    """A child killed mid-write must not poison later phases: a corrupt
    state file is treated as empty, not raised."""
    path = str(tmp_path / "state.json")
    with open(path, "w") as f:
        f.write("{not json")
    bench._update_state(path, {"ok": True})
    with open(path) as f:
        assert json.load(f) == {"ok": True}


def test_update_state_is_atomic_rename(tmp_path, monkeypatch):
    """The temp file must live in the SAME directory as the target so the
    rename is atomic (cross-device rename would copy, losing atomicity)."""
    path = str(tmp_path / "state.json")
    seen = {}
    real_replace = os.replace

    def spy(src, dst):
        seen["src_dir"] = os.path.dirname(os.path.abspath(src))
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", spy)
    bench._update_state(path, {"x": 1})
    assert seen["src_dir"] == str(tmp_path)


def test_run_phase_captures_child_failure(tmp_path, monkeypatch):
    """A crashing phase child returns an error string with the stderr tail
    instead of raising — the parent must still emit the other phase's rows."""
    fake = tmp_path / "fake_bench.py"
    fake.write_text("import sys; print('boom', file=sys.stderr); sys.exit(3)\n")
    monkeypatch.setattr(bench, "__file__", str(fake))
    err = bench._run_phase("standard", str(tmp_path / "s.json"), timeout_s=60)
    assert err.startswith("rc=3") and "boom" in err


def test_run_phase_timeout_is_reported(tmp_path, monkeypatch):
    fake = tmp_path / "fake_bench.py"
    fake.write_text("import time; time.sleep(60)\n")
    monkeypatch.setattr(bench, "__file__", str(fake))
    err = bench._run_phase("xl", str(tmp_path / "s.json"), timeout_s=1)
    assert "timeout" in err


def test_main_always_prints_one_json_line(tmp_path, monkeypatch, capsys):
    """Even with BOTH phases failing, main() prints exactly one JSON object
    (with the error fields) — the driver contract. rc=1 only because no
    standard value landed."""
    fake = tmp_path / "fake_bench.py"
    fake.write_text("import sys; sys.exit(9)\n")
    monkeypatch.setattr(bench, "__file__", str(fake))
    monkeypatch.setattr(bench, "STANDARD_TIMEOUT_S", 30)
    monkeypatch.setattr(bench, "XL_TIMEOUT_S", 30)
    rc = bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    payload = json.loads(out[0])
    assert "standard_error" in payload and "xl_error" in payload
    assert rc == 1


def test_main_merges_partial_phase_rows(tmp_path, monkeypatch, capsys):
    """A phase that lands rows then dies still contributes them: incremental
    state is the whole point. The fake standard phase writes the headline
    keys then exits 0; the fake xl phase writes one row then crashes."""
    fake = tmp_path / "fake_bench.py"
    fake.write_text(
        "import json, sys\n"
        "sys.path.insert(0, %r)\n"
        "import bench\n"
        "phase = sys.argv[sys.argv.index('--phase') + 1]\n"
        "state = sys.argv[sys.argv.index('--state') + 1]\n"
        "if phase == 'standard':\n"
        "    bench._update_state(state, {'metric': 'm', 'value': 1.5,\n"
        "                                'unit': 's', 'vs_baseline': 2.0})\n"
        "else:\n"
        "    bench._update_state(state, {'xl_sec_per_video': 3.0})\n"
        "    sys.exit(5)\n"
        % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    monkeypatch.setattr(bench, "__file__", str(fake))
    rc = bench.main()
    payload = json.loads(capsys.readouterr().out.strip())
    # headline keys come first (driver contract), partial xl row survives,
    # the xl failure is reported, and rc=0 because the standard value landed
    assert list(payload)[:4] == ["metric", "value", "unit", "vs_baseline"]
    assert payload["xl_sec_per_video"] == 3.0
    assert payload["xl_error"].startswith("rc=5")
    assert rc == 0


def test_real_phase_entrypoints_exist():
    """The child invocation contract: `--phase {standard,xl} --state <p>`."""
    assert callable(bench.phase_standard) and callable(bench.phase_xl)
    src = open(bench.__file__).read()
    assert '"--phase"' in src and '"--state"' in src


@pytest.mark.parametrize("keys,expect_rc", [({"value": 1.0}, 0), ({}, 1)])
def test_exit_code_tracks_standard_value(tmp_path, monkeypatch, capsys,
                                         keys, expect_rc):
    fake = tmp_path / "fake_bench.py"
    fake.write_text(
        "import json, sys, os\n"
        "sys.path.insert(0, %r)\n"
        "import bench\n"
        "state = sys.argv[sys.argv.index('--state') + 1]\n"
        "bench._update_state(state, json.loads(os.environ['ROWS']))\n"
        % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    monkeypatch.setattr(bench, "__file__", str(fake))
    monkeypatch.setenv("ROWS", json.dumps(keys))
    rc = bench.main()
    capsys.readouterr()
    assert rc == expect_rc
