from ad_mpc_tpu.utils import math  # noqa: F401
