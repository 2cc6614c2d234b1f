"""Driver-contract checks for __graft_entry__ (trace-only on CPU)."""

import sys

import jax

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])


def test_entry_is_traceable():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    # full-size VOC detect outputs
    assert out.boxes.shape == (1, 100, 4)
    assert out.scores.shape == out.classes.shape == out.valid.shape == (1, 100)
