"""Typed OCP specification — the single config tree replacing the reference's
scattered rosparam / AcadosOcp / launch-file configuration
(``ad_3d_optimizer.py:134-209``, ``acados_models/*_acados_ocp.json``).

The spec is a frozen dataclass of *static* python numbers plus numpy arrays;
it is hashable by identity and used as a closure constant, so changing a spec
triggers recompilation (the XLA analogue of ACADOS codegen) while every solve
with the same spec reuses the compiled program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class OCPSpec:
    """Linear-LS optimal control problem over horizon N.

    Cost (ACADOS LINEAR_LS parity, ``ad_3d_optimizer.py:146-178``):
        sum_k dt * 0.5*(||x_k - xref_k||^2_Q + ||u_k - uref_k||^2_R)
        + 0.5*||x_N - xref_N||^2_{W_e}
    with ``cost_scaling='acados'`` scaling stage costs by dt = tf/N and the
    terminal cost by 1 (ACADOS's default integral-cost discretization).
    """

    n_nodes: int  # N: shooting intervals
    t_horizon: float  # tf [s]
    nx: int
    nu: int
    q_cost: tuple  # diag of Q, length nx
    r_cost: tuple  # diag of R, length nu
    w_e_cost: tuple  # diag of terminal W_e, length nx

    # Box bounds (None entries -> +-inf). Soft entries carry L1 penalty z*.
    lbu: tuple = ()
    ubu: tuple = ()
    lbx: tuple = ()  # length nx, +-inf for unbounded
    ubx: tuple = ()
    soft_u: tuple = ()  # bool per input (ACADOS idxsbu)
    soft_x: tuple = ()  # bool per state
    zl_u: float = 10.0  # L1 slack penalty (ad_3d_optimizer.py:171-174)
    zu_u: float = 10.0
    Zl_u: float = 0.0
    Zu_u: float = 0.0

    # Integrator / solver options.
    rk4_steps: int = 1  # ERK sub-steps per shooting interval
    sqp_iters: int = 1  # 1 = RTI (reference SQP_RTI), >1 = full SQP
    qp_iters: int = 18  # fixed IPM iteration count
    levenberg: float = 1e-8  # Riccati regularization
    # Globalization for full-SQP mode (the reference's plain 'SQP' solver
    # type used for point references, ``create_ros_ad_mpc.py:88``): number
    # of halving line-search candidates evaluated against an L1-penalty
    # merit function. 1 = full Gauss-Newton steps (RTI behavior).
    ls_steps: int = 1
    ls_penalty: float = 1e3  # dynamics-defect L1 merit weight
    # Parallel-prefix (associative-scan) Riccati: O(log N) sequential depth
    # instead of O(N) — the long-horizon option (SURVEY.md §2.6/§5).
    assoc_riccati: bool = False
    cost_scaling: str = "acados"  # 'acados' (dt-scaled stages) or 'unit'
    # Matmul precision inside the solver trace. TPU f32 matmuls default to
    # bf16 multiplication passes, which destroys the interior-point Riccati
    # algebra (lam/t ratios span ~1e8) — 'highest' forces true f32.
    matmul_precision: str = "highest"
    # Yaw-wrap correction applied to this state index of yref (None = off);
    # reproduces ad_3d_optimizer.py:420-438.
    yaw_wrap_idx: Optional[int] = None

    @property
    def dt(self) -> float:
        return self.t_horizon / self.n_nodes

    @property
    def stage_scale(self) -> float:
        return self.dt if self.cost_scaling == "acados" else 1.0

    def weight_arrays(self, dtype=np.float64):
        s = self.stage_scale
        Q = np.diag(np.asarray(self.q_cost, dtype=dtype)) * s
        R = np.diag(np.asarray(self.r_cost, dtype=dtype)) * s
        QN = np.diag(np.asarray(self.w_e_cost, dtype=dtype))
        return Q, R, QN

    def bound_arrays(self, dtype=np.float64):
        def arr(t, n, fill):
            if not t:
                return np.full(n, fill, dtype=dtype)
            return np.asarray(t, dtype=dtype)

        lbu = arr(self.lbu, self.nu, -np.inf)
        ubu = arr(self.ubu, self.nu, np.inf)
        lbx = arr(self.lbx, self.nx, -np.inf)
        ubx = arr(self.ubx, self.nx, np.inf)
        soft_u = (
            np.asarray(self.soft_u, dtype=bool)
            if self.soft_u
            else np.zeros(self.nu, dtype=bool)
        )
        soft_x = (
            np.asarray(self.soft_x, dtype=bool)
            if self.soft_x
            else np.zeros(self.nx, dtype=bool)
        )
        return lbu, ubu, lbx, ubx, soft_u, soft_x
