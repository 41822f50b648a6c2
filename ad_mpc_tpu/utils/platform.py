"""Platform selection helpers.

The deployment environment may pre-register an accelerator backend (e.g. a
remote-TPU tunnel) via sitecustomize and pin ``JAX_PLATFORMS`` before user
code runs. Host-loop experiments (per-tick python loops) are latency-bound
and must run on CPU; batched benchmarks want the accelerator. These helpers
flip the platform *in-process* via ``jax.config``, which works as long as no
JAX backend has been initialized yet.
"""

from __future__ import annotations

import os


def force_cpu(n_virtual_devices: int | None = None) -> None:
    """Route JAX to the CPU backend (call before any jax operation)."""
    if n_virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={n_virtual_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def add_platform_arg(parser, default: str = "cpu"):
    parser.add_argument(
        "--platform",
        default=default,
        choices=["cpu", "default"],
        help="cpu = force CPU backend (host-loop experiments); "
        "default = whatever the environment provides (TPU if available)",
    )
    return parser


def apply_platform_arg(args) -> None:
    if getattr(args, "platform", "cpu") == "cpu":
        force_cpu()
