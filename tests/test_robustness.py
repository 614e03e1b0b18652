"""Robustness: parser fuzz (clean errors, no hangs), auto-resume discovery."""

import numpy as np
import pytest

from videovector_tpu.config.textformat import parse


BASE = """
name: "n"
layers { name: "a" type: RELU bottom: "x" top: "y"
  relu_param { negative_slope: 0.5 } }
layers { name: "b" type: CONCAT bottom: "y" top: "z" loss_weight: 1.5 }
"""


def test_parser_fuzz_truncations():
    """Every prefix of a valid file either parses or raises ValueError."""
    for cut in range(0, len(BASE), 7):
        text = BASE[:cut]
        try:
            parse(text)
        except ValueError:
            pass


def test_parser_fuzz_mutations(rng):
    chars = list(BASE)
    for trial in range(200):
        mutated = chars[:]
        for _ in range(rng.randint(1, 4)):
            pos = rng.randint(len(mutated))
            mutated[pos] = chr(rng.randint(32, 126))
        try:
            parse("".join(mutated))
        except ValueError:
            pass  # clean rejection is fine; crashes/hangs are not


def test_parser_deep_nesting():
    text = "a {" * 60 + "v: 1" + "}" * 60
    msg = parse(text)
    node = msg
    for _ in range(60):
        node = node.get_msg("a") if node.has("a") else node
    # and unbalanced nesting raises cleanly
    with pytest.raises(ValueError):
        parse("a {" * 5 + "v: 1" + "}" * 3)


def test_latest_snapshot_discovery(tmp_path):
    from videovector_tpu.tools.cli import _latest_snapshot
    assert _latest_snapshot("") is None
    prefix = str(tmp_path / "run")
    assert _latest_snapshot(prefix) is None
    for it in (10, 200, 30):
        (tmp_path / f"run_iter_{it}.vvstate").write_bytes(b"x")
    assert _latest_snapshot(prefix) == str(tmp_path / "run_iter_200.vvstate")
