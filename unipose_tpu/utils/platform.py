"""CPU-platform steering for multi-device tests/dryruns without TPU hardware.

This environment registers a TPU PJRT plugin eagerly in every Python process
(via sitecustomize) and pins ``JAX_PLATFORMS`` to it; initializing that plugin
can deadlock with torch-cpu in the same process, or die on a libtpu version
mismatch in driver contexts.  Env vars alone lose to sitecustomize, but
``jax.config.update("jax_platforms", "cpu")`` is honored as long as no backend
has been initialized yet — so this must run BEFORE any jax device use,
including imports that create arrays at module scope.

Single home for a hard-won recipe (CLAUDE.md "Environment quirks"); used by
``__graft_entry__.dryrun_multichip``, ``tests/conftest.py`` and
``scripts/scaling_dryrun.py``.
"""

from __future__ import annotations

import os
import re


def force_cpu_platform(n_devices: int) -> None:
    """Steer this process to a virtual ``n_devices``-device CPU backend.

    Idempotent w.r.t. XLA_FLAGS (an existing device-count flag is replaced,
    not duplicated).  Raises if called after a backend was already
    initialized on a different platform (jax rejects the config update).
    """
    flags = os.environ.get("XLA_FLAGS", "")
    opt = f"--xla_force_host_platform_device_count={n_devices}"
    if "xla_force_host_platform_device_count" in flags:
        flags = re.sub(
            r"--xla_force_host_platform_device_count=\d+", opt, flags
        )
    else:
        flags = f"{flags} {opt}".strip()
    os.environ["XLA_FLAGS"] = flags

    import jax

    jax.config.update("jax_platforms", "cpu")
