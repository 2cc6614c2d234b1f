"""Device-side training target assignment.

Fixed-capacity, jit-safe rebuilds of the reference's host-numpy
``anchor_target_layer.py`` / ``proposal_target_layer.py`` (SURVEY.md §3.2).
Stochastic subsampling uses rank-based selection over jax.random uniforms
instead of ``np.random.choice`` — same sampling distribution, static shapes
(SURVEY.md §10 "hard parts").
"""

from trcnn.targets.anchor_targets import AnchorTargets, anchor_targets
from trcnn.targets.proposal_targets import ProposalTargets, proposal_targets

__all__ = ["AnchorTargets", "anchor_targets",
           "ProposalTargets", "proposal_targets"]
