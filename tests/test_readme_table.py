"""README's performance table must be exactly what
benchmarks/update_readme.py renders from the committed
bench_results.json (VERDICT r3 weak #2 — no doc numbers without an
artifact behind them)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_table_matches_artifact():
    spec = importlib.util.spec_from_file_location(
        "update_readme", os.path.join(REPO, "benchmarks", "update_readme.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    block = mod.render_table()
    with open(os.path.join(REPO, "README.md")) as f:
        text = f.read()
    assert mod.START in text and mod.END in text
    start = text.index(mod.START)
    end = text.index(mod.END) + len(mod.END)
    assert text[start:end] == block, (
        "README table out of date: run python benchmarks/update_readme.py"
    )
