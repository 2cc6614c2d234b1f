"""Distribution-equivalence tests for the stochastic target layers.

SURVEY.md §10 hard-part 2: the rebuild replaces ``np.random.choice``
(dynamic-length, host-side) with rank-of-iid-uniform selection at static
shapes, and the replacement-fill tail with deterministic cycling of the
selected set.  Round 2 asserted (docstrings in
``trcnn/targets/anchor_targets.py`` / ``proposal_targets.py``) that these
preserve the sampling *distribution*; these tests verify it statistically:

  * rank-of-uniforms with a static cap K over M members draws every
    K-subset with equal probability — i.e. it IS uniform sampling without
    replacement (``np.random.choice(M, K, replace=False)`` semantics);
  * the same holds when the quota is a *traced* scalar (the dynamic bg
    quota path);
  * the proposal-target tail fill cycles the selected bg samples: per draw
    the per-candidate fill counts are balanced to within 1 (the exact-count
    property), and across draws each tail slot's occupant is uniform over
    the selected set (the with-replacement marginal upstream has).

Statistical method: chi-square goodness of fit over SUBSET IDENTITY (the
full distribution, not just per-candidate marginals), alpha = 1e-3 with
fixed seeds (deterministic — no flaky CI).  Power: with T/cells >= 20
expected per cell, a 2x over-selection of any subset shifts the statistic
by >> the critical value; per-candidate marginal deviations of ~25%
relative are detected at these sample sizes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trcnn.config import AnchorTargetConfig, ProposalTargetConfig
from trcnn.targets.anchor_targets import _random_rank, anchor_targets
from trcnn.targets.proposal_targets import proposal_targets

pytestmark = pytest.mark.fast


def chi2_crit(df: int, z: float = 3.090) -> float:
    """Wilson–Hilferty upper-tail chi-square critical value (z=3.090 ~
    alpha 1e-3).  Good to ~1% for df >= 2."""
    a = 2.0 / (9.0 * df)
    return df * (1.0 - a + z * np.sqrt(a)) ** 3


def subset_counts(sel: np.ndarray, member_idx: np.ndarray) -> dict:
    """Map each trial's boolean selection row to a frozenset id, count."""
    counts = {}
    for row in sel:
        key = tuple(np.flatnonzero(row[member_idx]))
        counts[key] = counts.get(key, 0) + 1
    return counts


def assert_uniform_subsets(counts: dict, n_subsets: int, trials: int):
    assert len(counts) == n_subsets, (
        f"only {len(counts)}/{n_subsets} subsets ever drawn")
    exp = trials / n_subsets
    stat = sum((c - exp) ** 2 / exp for c in counts.values())
    crit = chi2_crit(n_subsets - 1)
    assert stat < crit, f"chi2 {stat:.1f} >= crit {crit:.1f}"


# --------------------------------------------------------------------------
# Unit level: _random_rank IS uniform-without-replacement
# --------------------------------------------------------------------------


def test_rank_selection_uniform_subsets():
    """rank < K over M=6 members: all C(6,3)=20 subsets equally likely."""
    n, k, trials = 10, 3, 4000
    mask = np.zeros(n, bool)
    member_idx = np.asarray([0, 2, 3, 5, 7, 9])
    mask[member_idx] = True
    mask_j = jnp.asarray(mask)

    @jax.jit
    @functools.partial(jax.vmap)
    def draw(key):
        r = _random_rank(key, mask_j)
        return mask_j & (r < k)

    sel = np.asarray(draw(jax.random.split(jax.random.PRNGKey(42), trials)))
    assert np.all(sel.sum(axis=1) == k)          # exactly K per draw
    assert not np.any(sel[:, ~mask])             # never a non-member
    assert_uniform_subsets(subset_counts(sel, member_idx), 20, trials)


def test_rank_selection_traced_quota():
    """The bg path compares rank to a TRACED quota — distribution must be
    identical to the static-cap case."""
    n, trials = 8, 3000
    mask = np.ones(n, bool)
    mask[1] = mask[4] = False                    # 6 members
    member_idx = np.flatnonzero(mask)
    mask_j = jnp.asarray(mask)

    @jax.jit
    @functools.partial(jax.vmap, in_axes=(0, None))
    def draw(key, quota):
        r = _random_rank(key, mask_j)
        return mask_j & (r < quota)              # quota is a traced scalar

    sel = np.asarray(draw(jax.random.split(jax.random.PRNGKey(7), trials),
                          jnp.int32(2)))
    assert np.all(sel.sum(axis=1) == 2)
    assert_uniform_subsets(subset_counts(sel, member_idx), 15, trials)


def test_rank_selection_cap_exceeds_members():
    """K >= M selects every member (the no-subsampling branch)."""
    mask = jnp.asarray(np.asarray([1, 0, 1, 1, 0, 1], bool))
    r = _random_rank(jax.random.PRNGKey(0), mask)
    sel = np.asarray(mask & (r < 10))
    np.testing.assert_array_equal(sel, np.asarray(mask))


# --------------------------------------------------------------------------
# Integration: anchor_targets fg/bg sampling
# --------------------------------------------------------------------------


def _anchor_fixture():
    """10 anchors perfectly on the gt (all fg), 6 far-away (all bg);
    cfg batch 8, fg fraction 0.5 -> fg cap 4, bg quota 4."""
    fg = np.tile(np.asarray([[10.0, 10.0, 59.0, 59.0]], np.float32), (10, 1))
    bg = np.tile(np.asarray([[120.0, 120.0, 149.0, 149.0]], np.float32),
                 (6, 1))
    anchors = jnp.asarray(np.concatenate([fg, bg], axis=0))
    gt = jnp.asarray([[10.0, 10.0, 59.0, 59.0]])
    gt_valid = jnp.asarray([True])
    cfg = AnchorTargetConfig(batch_size=8, fg_fraction=0.5)
    return anchors, gt, gt_valid, cfg


def test_anchor_targets_fg_subsets_uniform():
    anchors, gt, gt_valid, cfg = _anchor_fixture()
    trials = 4200

    @jax.jit
    @functools.partial(jax.vmap)
    def draw(key):
        at = anchor_targets(key, anchors, gt, gt_valid, 200.0, 200.0, cfg=cfg)
        return at.labels

    labels = np.asarray(draw(jax.random.split(jax.random.PRNGKey(3), trials)))
    fg_sel = labels[:, :10] == 1
    bg_sel = labels[:, 10:] == 0
    assert np.all(fg_sel.sum(axis=1) == 4)       # fg cap always binds
    assert np.all(bg_sel.sum(axis=1) == 4)       # quota = 8 - 4
    # full subset-identity uniformity for the fg draw: C(10,4) = 210 cells
    assert_uniform_subsets(subset_counts(fg_sel, np.arange(10)), 210, trials)
    # bg marginals: each of 6 candidates selected with p = 4/6
    freq = bg_sel.mean(axis=0)
    sigma = np.sqrt((4 / 6) * (2 / 6) / trials)
    np.testing.assert_allclose(freq, 4 / 6, atol=5 * sigma)


def test_anchor_targets_bg_quota_tracks_fg():
    """Fewer fg than the cap -> the bg quota expands (256-sample contract)."""
    anchors, gt, gt_valid, _ = _anchor_fixture()
    cfg = AnchorTargetConfig(batch_size=12, fg_fraction=0.5)  # cap 6, 10 fg

    @jax.jit
    @functools.partial(jax.vmap)
    def draw(key):
        at = anchor_targets(key, anchors, gt, gt_valid, 200.0, 200.0, cfg=cfg)
        return at.labels, at.num_fg, at.num_examples

    labels, num_fg, num_ex = map(np.asarray, draw(
        jax.random.split(jax.random.PRNGKey(11), 500)))
    assert np.all(num_fg == 6)
    assert np.all(num_ex == 12)                  # 6 fg + 6 bg (all 6 bg cands)
    assert np.all((labels[:, 10:] == 0).sum(axis=1) == 6)


# --------------------------------------------------------------------------
# Integration: proposal_targets sampling + replacement-fill tail
# --------------------------------------------------------------------------


def _pt_fixture(n_fg_cand, n_bg_cand, s=16, fg_frac=0.25):
    """Candidates vs one gt at (0,0,99,99): fg = the gt box itself (IoU 1),
    bg = boxes with IoU ~ 0.25 (inside the [0.1, 0.5) band)."""
    gt = np.asarray([[0.0, 0.0, 99.0, 99.0]], np.float32)
    fg = np.tile(gt, (n_fg_cand, 1))
    # 50x100 box overlapping half the gt: inter 50*100, union 15000 -> 1/3
    bg = np.tile(np.asarray([[0.0, 50.0, 99.0, 149.0]], np.float32),
                 (max(n_bg_cand, 1), 1))[:n_bg_cand]
    rois = jnp.asarray(np.concatenate([fg, bg], axis=0))
    roi_valid = jnp.ones(rois.shape[0], bool)
    cfg = ProposalTargetConfig(rois_per_image=s, fg_fraction=fg_frac)
    return (rois, roi_valid, jnp.asarray(gt), jnp.asarray([5], jnp.int32),
            jnp.asarray([True]), cfg)


def test_proposal_targets_fg_subsets_uniform():
    """6 fg candidates (5 proposals + the appended gt), cap 4: all C(6,4)=15
    fg subsets equally likely."""
    rois, rv, gt, gl, gv, cfg = _pt_fixture(n_fg_cand=5, n_bg_cand=30)
    trials = 3000

    @jax.jit
    @functools.partial(jax.vmap)
    def draw(key):
        pt = proposal_targets(key, rois, rv, gt, gl, gv, cfg=cfg)
        return pt.is_fg, pt.labels, pt.valid

    is_fg, labels, valid = map(np.asarray, draw(
        jax.random.split(jax.random.PRNGKey(5), trials)))
    assert np.all(valid)
    assert np.all(is_fg.sum(axis=1) == 4)
    assert np.all(is_fg[:, :4]) and not np.any(is_fg[:, 4:])  # fg compacted first
    assert np.all(labels[:, :4] == 5) and np.all(labels[:, 4:] == 0)
    # which fg candidate filled each slot is identified by... all fg boxes
    # are identical here, so uniformity is tested at the anchor-layer level;
    # this test pins the structural contract (cap, compaction, labels).


def test_proposal_targets_fg_candidate_uniform():
    """Distinguishable fg candidates: per-candidate selection frequency
    matches uniform 4/6 and the subset distribution is uniform."""
    # 6 distinct fg candidates: the gt plus 5 slightly-shifted copies
    gt = np.asarray([[0.0, 0.0, 99.0, 99.0]], np.float32)
    shifts = np.asarray([[i, 0.0, i, 0.0] for i in range(1, 6)], np.float32)
    fg = np.concatenate([gt + s[None] for s in shifts], axis=0)  # IoU ~0.95
    bg = np.tile(np.asarray([[0.0, 50.0, 99.0, 149.0]], np.float32), (20, 1))
    rois = jnp.asarray(np.concatenate([fg, bg], axis=0))
    rv = jnp.ones(rois.shape[0], bool)
    cfg = ProposalTargetConfig(rois_per_image=16, fg_fraction=0.25)
    trials = 3000

    @jax.jit
    @functools.partial(jax.vmap)
    def draw(key):
        pt = proposal_targets(key, rois, rv, jnp.asarray(gt),
                              jnp.asarray([5], jnp.int32),
                              jnp.asarray([True]), cfg=cfg)
        # identify fg candidates by x1: shifted copies have x1 = 1..5, gt 0
        return pt.is_fg, pt.rois[:, 0]

    is_fg, x1 = map(np.asarray, draw(
        jax.random.split(jax.random.PRNGKey(17), trials)))
    assert np.all(is_fg.sum(axis=1) == 4)
    # candidate identity of each selected fg slot (gt appended = x1 == 0)
    sel = np.zeros((trials, 6), bool)
    for t in range(trials):
        for x in x1[t][is_fg[t]]:
            sel[t, int(round(x))] = True
    assert np.all(sel.sum(axis=1) == 4)
    assert_uniform_subsets(subset_counts(sel, np.arange(6)), 15, trials)


def test_proposal_targets_tail_fill_exact_counts_and_marginal():
    """3 bg candidates, quota 12: every bg is selected, tail slots cycle
    them; per-draw occupancy counts are balanced to within 1 and the
    across-draw marginal of each tail slot is uniform over the 3."""
    # distinguishable bg candidates via y1 shifts (IoU with gt stays ~1/3)
    gt = np.asarray([[0.0, 0.0, 99.0, 99.0]], np.float32)
    bgs = np.asarray([[0.0, 50.0 + d, 99.0, 149.0 + d] for d in range(3)],
                     np.float32)
    rois = jnp.asarray(bgs)
    rv = jnp.ones(3, bool)
    cfg = ProposalTargetConfig(rois_per_image=16, fg_fraction=0.25)
    trials = 2400

    @jax.jit
    @functools.partial(jax.vmap)
    def draw(key):
        pt = proposal_targets(key, rois, rv, jnp.asarray(gt),
                              jnp.asarray([5], jnp.int32),
                              jnp.asarray([True]), cfg=cfg)
        return pt.rois[:, 1], pt.is_fg, pt.valid, pt.num_fg

    y1, is_fg, valid, num_fg = map(np.asarray, draw(
        jax.random.split(jax.random.PRNGKey(23), trials)))
    # the appended gt is the only fg candidate -> 1 fg, 15 bg-ish slots
    assert np.all(num_fg == 1)
    assert np.all(valid)
    ident = np.rint(y1 - 50.0).astype(int)       # bg id 0..2; gt slot -> -50
    bg_rows = ~is_fg
    assert np.all(bg_rows.sum(axis=1) == 15)
    # exact-count property: 15 slots over 3 candidates -> exactly 5 each
    for t in range(0, trials, 100):              # spot-check per-draw balance
        c = np.bincount(ident[t][bg_rows[t]], minlength=3)
        assert c.min() >= 4 and c.max() <= 6 and c.sum() == 15
    # across-draw marginal of the LAST slot: uniform over the 3 candidates
    last = ident[:, -1]
    counts = np.bincount(last, minlength=3)
    exp = trials / 3
    stat = ((counts - exp) ** 2 / exp).sum()
    assert stat < chi2_crit(2), f"last-slot marginal chi2 {stat:.1f}"


def test_proposal_targets_matches_numpy_choice_reference():
    """Head-to-head: the rank-based fg subset distribution vs an explicit
    ``np.random.choice(replace=False)`` reference, two-sample chi-square."""
    n, k, trials = 6, 4, 3000
    mask = jnp.ones(n, bool)

    @jax.jit
    @functools.partial(jax.vmap)
    def draw(key):
        r = _random_rank(key, mask)
        return mask & (r < k)

    ours = np.asarray(draw(jax.random.split(jax.random.PRNGKey(29), trials)))
    rs = np.random.RandomState(31)
    ref = np.zeros((trials, n), bool)
    for t in range(trials):
        ref[t, rs.choice(n, k, replace=False)] = True

    c_ours = subset_counts(ours, np.arange(n))
    c_ref = subset_counts(ref, np.arange(n))
    keys = sorted(set(c_ours) | set(c_ref))
    assert len(keys) == 15
    stat = 0.0
    for key in keys:
        a, b = c_ours.get(key, 0), c_ref.get(key, 0)
        stat += (a - b) ** 2 / (a + b)
    assert stat < chi2_crit(14), f"two-sample chi2 {stat:.1f}"
