from ad_mpc_tpu.runtime.bridge import (
    Publisher,
    RateTimer,
    SpscQueue,
    Subscriber,
    monotonic_ns,
)

__all__ = ["Publisher", "Subscriber", "SpscQueue", "RateTimer", "monotonic_ns"]
