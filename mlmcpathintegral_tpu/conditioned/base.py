"""Conditioned fine action interface.

Reference parity: src/action/conditionedfineaction.hh:38-67.  Given a state
whose *coarse* dofs are set (the even sites of a 1-D path, the coarse
vertices/links of a 2-D field), a ConditionedFineAction

  * fills the fine-only dofs by sampling from an approximate conditional
    q(fine | coarse), and
  * evaluates -log q(fine | coarse) *including the normalisation*
    (the -1/2 log W'' / log Z terms) — any mismatch between the two
    silently biases the two-level accept ratio (SURVEY.md §7).

Both operations are pure and batched: states are [..., ndof] arrays, keys
are jax PRNG keys, and the fine-site fill-in is vectorised over all fine
sites at once (they are conditionally independent given the coarse sites).
"""

from __future__ import annotations

import abc


class ConditionedFineAction(abc.ABC):

    #: True when prolongate + fill_fine_points overwrite EVERY dof with
    #: values determined only by the coarse dofs and fresh noise (never
    #: reading a fine dof of the template state).  All current fill-ins
    #: satisfy this (they draw the conditionally-independent fine sites
    #: in one vectorised pass); it licenses the batched delayed-
    #: acceptance screen (mc/twolevel.py::make_batched_screen), which
    #: generates a whole chunk of proposals as one tensor program.  A
    #: future sequential/Gibbs fill that reads previously-filled fine
    #: dofs of the CURRENT state must set this False.
    independent_fill = True

    def __init__(self, action):
        #: fine-level action this conditions on
        self.action = action

    @abc.abstractmethod
    def fill_fine_points(self, key, x):
        """Sample the fine-only dofs of x given its coarse dofs; returns a
        full state [..., ndof]."""

    @abc.abstractmethod
    def evaluate(self, x):
        """-log q(fine | coarse) incl. normalisation: [..., ndof] -> [...]."""
