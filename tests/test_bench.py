"""bench.py watchdog-parent mechanics (stubbed child — no device).

The real measurement needs the TPU; these tests pin the contract that
matters to the driver: exactly ONE JSON line on stdout, rc 0 on success,
rc 1 after exhausted retries, hung children killed and retried.
"""
import json
import subprocess
import sys
import types


def _load_bench():
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "bench.py"
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_watchdog_forwards_single_json_line(monkeypatch, capsys):
    bench = _load_bench()
    line = json.dumps({"metric": "m", "value": 1.0, "unit": "u",
                       "vs_baseline": 1.0})

    def fake_run(cmd, **kw):
        assert kw["env"]["_PHASM_BENCH_CHILD"] == "1"
        return types.SimpleNamespace(
            returncode=0, stdout=f"# noise\n{line}\n", stderr=""
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._watchdog_parent() == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == [line]
    assert json.loads(out[0])["value"] == 1.0


def test_watchdog_retries_hang_then_succeeds(monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    line = json.dumps({"metric": "m", "value": 2.0, "unit": "u",
                       "vs_baseline": 1.0})
    calls = {"n": 0}

    def fake_run(cmd, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))
        return types.SimpleNamespace(returncode=0, stdout=line + "\n",
                                     stderr="")

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._watchdog_parent() == 0
    assert calls["n"] == 2
    assert capsys.readouterr().out.strip() == line


def test_watchdog_gives_up_nonzero(monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    def fake_run(cmd, **kw):
        return types.SimpleNamespace(returncode=1, stdout="", stderr="boom")

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._watchdog_parent() == 1
    assert capsys.readouterr().out == ""  # no JSON line on failure


def test_child_entry_is_plumbed():
    """bench.py __main__ must route _PHASM_BENCH_CHILD=1 to main()."""
    src = open("bench.py").read()
    assert "_PHASM_BENCH_CHILD" in src
    assert "_watchdog_parent" in src
