"""Unit tests for the interleaved A/B protocol helpers
(``tools/ab_compare.py``). The scheduling and summary math is pure —
no SparkSession needed; the end-to-end path shares bench.py's
measured loop shape, which tests/test_bench_contract.py covers."""

import importlib.util
import pathlib
import sys

_TOOLS = pathlib.Path(__file__).resolve().parent.parent / "tools"


def _load():
    spec = importlib.util.spec_from_file_location(
        "ab_compare", _TOOLS / "ab_compare.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("ab_compare", mod)
    spec.loader.exec_module(mod)
    return mod


def test_ab_schedule_is_balanced_abba():
    ab = _load()
    assert ab.ab_schedule(1) == ["a", "b"]
    assert ab.ab_schedule(2) == ["a", "b", "b", "a"]
    assert ab.ab_schedule(3) == ["a", "b", "b", "a", "a", "b"]
    for n in (1, 2, 5, 8):
        order = ab.ab_schedule(n)
        assert order.count("a") == order.count("b") == n
        # each variant leads half the pairs (rounded) — the property
        # that cancels linear drift
        leads = [order[2 * i] for i in range(n)]
        assert abs(leads.count("a") - leads.count("b")) <= 1


def test_summarize_uses_per_pair_ratios():
    ab = _load()
    # linear drift: everything slows 2x halfway through — per-pair
    # ratios stay 1.25 throughout, while a median-of-medians would
    # see whatever the block ordering happened to be
    s = ab.summarize([1.0, 1.0, 2.0, 2.0], [1.25, 1.25, 2.5, 2.5])
    assert s["median_ratio_b_over_a"] == 1.25
    assert s["ratio_spread"] == [1.25, 1.25]
    assert s["median_a_sec"] == 1.5 and s["median_b_sec"] == 1.875

    # a zero timing can't crash the ratio math; it is skipped
    s = ab.summarize([0.0, 1.0], [1.0, 1.1])
    assert s["pair_ratios_b_over_a"][0] is None
    assert s["median_ratio_b_over_a"] == 1.1


def test_resolve_accepts_file_path_variant(tmp_path):
    ab = _load()
    f = tmp_path / "variant.py"
    f.write_text("def cand(spark, sf_dir):\n    return (spark, sf_dir)\n")
    fn = ab._resolve(f"{f}::cand")
    assert fn("S", "D") == ("S", "D")
