"""Quadrotor mission-loop node: the ``gp_mpc_node.py`` analogue.

Reproduces the reference's closed-loop flight controller semantics
(``ros_gp_mpc/nodes/gp_mpc_node.py``):

- the mission **state machine** inside ``set_reference`` (:518-692):
  provisional hover -> ascend to the trajectory start -> track -> land ->
  off;
- every-2nd-odometry optimization gating with skipped-message compensation
  (``odometry_callback:443-492``);
- windowed + downsampled reference chunks onto the MPC horizon (:652-661);
- dataset recording rows (state_in, u, state_out, nominal prediction, dt)
  for GP fitting (``save_recording_data``, :710-754);
- post-run RMSE bookkeeping (:556-599).

Design difference (SURVEY.md §5 race note): instead of callback-mutated
shared state, the node is a synchronous stepper — ``step(x, t)`` consumes
one state estimate and returns the control — so the closed loop is
deterministic and testable; transport (UDP bridge) wraps it unchanged.
"""

from __future__ import annotations

from enum import Enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.control.mpc import QuadMPC, quad_spec
from ad_mpc_tpu.models.quadrotor import hover_input
from ad_mpc_tpu.ops.integrators import discretize
from ad_mpc_tpu.models.quadrotor import quad_dynamics


class MissionPhase(Enum):
    HOVER = "hover"  # provisional hover at current position
    ASCEND = "ascend"  # raise to the trajectory start point
    TRACK = "track"  # follow the loaded reference
    LAND = "land"  # descend to ground
    OFF = "off"


class QuadMissionNode:
    """Synchronous mission controller over one :class:`QuadMPC`."""

    def __init__(
        self,
        mpc: Optional[QuadMPC] = None,
        n_nodes: int = 10,
        t_horizon: float = 1.0,
        control_period: float = 0.02,
        optimize_every: int = 2,
        land_z: float = 0.1,
        record: bool = False,
    ):
        self.mpc = mpc if mpc is not None else QuadMPC(
            spec=quad_spec(n_nodes=n_nodes, t_horizon=t_horizon)
        )
        self.spec = self.mpc.spec
        self.control_period = control_period
        self.optimize_every = optimize_every
        self.land_z = land_z
        self.phase = MissionPhase.HOVER
        self.record = record

        # Loaded reference (dense), set by receive_trajectory.
        self._traj = None
        self._t_ref = None
        self._u_traj = None
        self._track_t0 = None

        self._msg_count = 0
        self._last_u = np.asarray(hover_input())
        self._hover_point = None
        # Sequence-number gating state (skipped-message compensation,
        # gp_mpc_node.py:443-492).
        self._last_seq = None
        self._optimize_next = True
        self.n_skipped = 0
        self.last_xs = None  # latest predicted trajectory (for body rates)

        # Recording + RMSE bookkeeping.
        self.records: list[dict] = []
        self._track_err2 = []
        self._nominal_F = discretize(
            lambda x, u: quad_dynamics(x, u, self.mpc.params),
            control_period,
            int(max(round(control_period / 5e-4), 1)),
        )

    # ------------------------------------------------------------- reference

    def receive_trajectory(self, traj, t_ref, u_traj=None):
        """Load a dense reference (the ``ReferenceTrajectory`` message,
        ``gp_mpc_node.py:344-384``); arms the ASCEND phase."""
        self._traj = np.asarray(traj)
        self._t_ref = np.asarray(t_ref)
        self._u_traj = (
            np.asarray(u_traj)
            if u_traj is not None
            else np.tile(hover_input(), (len(t_ref), 1))
        )
        self._track_t0 = None
        self.phase = MissionPhase.ASCEND

    def _reference_window(self, t_now: float):
        """Window + downsample the dense reference onto the horizon
        (``gp_mpc_node.py:652-661``)."""
        n = self.spec.n_nodes
        i0 = int(np.searchsorted(self._t_ref, t_now))
        ref_dt = self._t_ref[1] - self._t_ref[0]
        stride = max(int(round(self.spec.dt / ref_dt)), 1)
        idx = np.clip(i0 + stride * np.arange(n + 1), 0, len(self._t_ref) - 1)
        u_idx = np.clip(idx[:-1], 0, len(self._u_traj) - 1)
        return self._traj[idx], self._u_traj[u_idx]

    def _point_reference(self, p, psi_quat=None):
        n = self.spec.n_nodes
        ref = np.zeros((n + 1, 13))
        ref[:, :3] = p
        ref[:, 3] = 1.0  # identity quaternion
        u = np.tile(hover_input(), (n, 1))
        return ref, u

    # ---------------------------------------------------------- mission step

    def step(self, x: np.ndarray, t: float, seq: int | None = None):
        """One odometry message: advance the state machine, maybe optimize.

        Returns the control (4,) to apply (the previous one on skipped
        messages, mirroring the every-2nd-msg gating).

        ``seq``: odometry sequence number. When given, the gating uses the
        reference's skipped-message compensation (``gp_mpc_node.py:443-492``):
        an odd number of dropped messages flips the optimization phase so
        the cadence is preserved, and a drop detected on an optimization
        tick forces optimizing twice in a row to catch the reference up.
        (The reference window itself is time-indexed here, so the
        ``current_idx`` adjustment is inherent.)
        """
        x = np.asarray(x)
        self._msg_count += 1
        if self.phase == MissionPhase.OFF:
            # Motors off: clear the held command so skipped-message gating
            # can never replay a stale pre-landing thrust.
            self._last_u = np.zeros(4)
            return self._last_u

        if seq is not None:
            skipped = 0
            if self._last_seq is not None:
                skipped = max(int(seq) - self._last_seq - 1, 0)
                self.n_skipped += skipped
            self._last_seq = int(seq)
            if not self._optimize_next:
                if skipped % 2 == 1:
                    # Odd drop count: optimize NOW to preserve the cadence.
                    self._optimize_next = False
                else:
                    self._optimize_next = True
                    return self._last_u
            else:
                if skipped > 0:
                    # The reference is already late: optimize twice in a
                    # row (this tick and the next).
                    self._optimize_next = True
                else:
                    self._optimize_next = False
        elif (self._msg_count - 1) % self.optimize_every != 0:
            return self._last_u

        # ----- state machine (gp_mpc_node.py:518-692)
        if self.phase == MissionPhase.HOVER:
            if self._hover_point is None:
                self._hover_point = x[:3].copy()
            ref, u_ref = self._point_reference(self._hover_point)

        elif self.phase == MissionPhase.ASCEND:
            start = self._traj[0, :3]
            ref, u_ref = self._point_reference(start)
            if np.linalg.norm(x[:3] - start) < 0.15 and (
                np.linalg.norm(x[7:10]) < 0.5
            ):
                self.phase = MissionPhase.TRACK
                self._track_t0 = t

        elif self.phase == MissionPhase.TRACK:
            t_rel = t - self._track_t0
            if t_rel >= self._t_ref[-1]:
                self.phase = MissionPhase.LAND
                ref, u_ref = self._point_reference(
                    np.array([x[0], x[1], self.land_z])
                )
            else:
                ref, u_ref = self._reference_window(t_rel)
                # RMSE bookkeeping against the instantaneous reference.
                i = int(np.searchsorted(self._t_ref, t_rel))
                i = min(i, len(self._traj) - 1)
                self._track_err2.append(
                    float(np.sum((x[:3] - self._traj[i, :3]) ** 2))
                )

        elif self.phase == MissionPhase.LAND:
            ref, u_ref = self._point_reference(
                np.array([x[0], x[1], self.land_z])
            )
            if x[2] < self.land_z + 0.05 and np.linalg.norm(x[7:10]) < 0.3:
                self.phase = MissionPhase.OFF

        else:  # OFF (unreachable: handled before the gating above)
            self._last_u = np.zeros(4)
            return self._last_u

        self.mpc.set_reference(ref, u_ref)
        us, xs = self.mpc.optimize(x)
        u = np.asarray(us[0])
        self.last_xs = np.asarray(xs)

        if self.record and self.phase == MissionPhase.TRACK:
            x_pred = np.asarray(self._nominal_F(jnp.asarray(x), jnp.asarray(u)))
            self.records.append(
                {
                    "state_in": x,
                    "input": u,
                    "x_pred": x_pred,
                    "dt": self.control_period * self.optimize_every,
                    "t": t,
                }
            )

        self._last_u = u
        return u

    # ------------------------------------------------------------- reporting

    def tracking_rmse(self) -> float:
        if not self._track_err2:
            return float("nan")
        return float(np.sqrt(np.mean(self._track_err2)))

    def recording_arrays(self):
        """Stack recording rows into the (x_in, u, x_out, x_pred, dt) arrays
        the GP dataset pipeline consumes (``gp_mpc_node.py:710-754``). The
        caller fills ``x_out`` by pairing consecutive rows."""
        if len(self.records) < 2:
            return None
        x_in = np.stack([r["state_in"] for r in self.records[:-1]])
        u = np.stack([r["input"] for r in self.records[:-1]])
        x_pred = np.stack([r["x_pred"] for r in self.records[:-1]])
        x_out = np.stack([r["state_in"] for r in self.records[1:]])
        dt = np.asarray([r["dt"] for r in self.records[:-1]])
        return x_in, u, x_out, x_pred, dt
