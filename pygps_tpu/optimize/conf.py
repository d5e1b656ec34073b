"""Random-restart configuration.

Counterpart of pyGPs ``Optimization/conf.py::random_init_conf``: per-block
uniform sampling ranges for hyperparameter restarts (field names per
SURVEY.md §2.3, tagged verify upstream).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class random_init_conf:
    num_restarts: int = 0
    min_threshold: float | None = None
    mean_range: list = field(default_factory=list)   # [(lo, hi)] per mean hyp
    cov_range: list = field(default_factory=list)    # [(lo, hi)] per cov hyp
    lik_range: list = field(default_factory=list)    # [(lo, hi)] per lik hyp

    # reference-style aliases
    @property
    def meanRange(self):
        return self.mean_range

    @meanRange.setter
    def meanRange(self, v):
        self.mean_range = v

    @property
    def covRange(self):
        return self.cov_range

    @covRange.setter
    def covRange(self, v):
        self.cov_range = v

    @property
    def likRange(self):
        return self.lik_range

    @likRange.setter
    def likRange(self, v):
        self.lik_range = v
