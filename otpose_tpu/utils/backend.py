"""Backend liveness guard for the axon-tunneled TPU.

The axon PJRT plugin reaches the TPU through a local TCP relay (ports
8082/8092/...).  When that relay daemon is down, the plugin does not fail:
``import jax`` / backend init **hangs forever** waiting to dial the tunnel.
Any unattended entry point (``bench.py``, ``__graft_entry__.py``) that hangs
produces no artifact at all, which is strictly worse than an honest CPU
fallback.

``ensure_live_backend()`` therefore probes the relay's listen port *before*
JAX initializes and, if the axon backend was requested but the relay is not
listening, pins JAX to CPU.  Call it before the first ``import jax`` use in
a process (it is a no-op once the backend is initialized, and a no-op in
CPU-pinned processes such as the test suite).
"""

from __future__ import annotations

import os
import socket

# First local listen port of the relay (/root/.tpu_init.py PORTS[0]); the
# plugin cannot reach the chip if nothing is listening here.
_AXON_RELAY_PORT = int(os.environ.get("AXON_RELAY_PORT", "8082"))


def axon_relay_alive(port: int | None = None, timeout: float = 0.5) -> bool:
    """True iff the axon tunnel relay accepts TCP connections on ``port``.

    ``port=None`` reads ``_AXON_RELAY_PORT`` at call time (a def-time
    default would freeze the value and ignore test monkeypatching).
    """
    if port is None:
        port = _AXON_RELAY_PORT
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=timeout):
            return True
    except OSError:
        return False


def _axon_requested() -> bool:
    platforms = [p.strip()
                 for p in os.environ.get("JAX_PLATFORMS", "").split(",")
                 if p.strip()]
    if "axon" in platforms:
        return True
    if platforms == ["cpu"]:
        # explicit cpu-only request: ensure_live_backend pins it through
        # jax.config (the plugin ignores the env var); no relay involved
        return False
    # ANY other value (unset, "tpu", typos, ...) with the plugin installed
    # still selects axon — the plugin ignores JAX_PLATFORMS entirely
    # (CLAUDE.md) — so the relay probe must run or a dead relay hangs init
    return bool(os.environ.get("PALLAS_AXON_TPU_GEN"))


def enable_compile_cache() -> None:
    """Point JAX at the persistent on-disk compilation cache.

    The flagship train step takes ~15-20 min to compile for TPU; tools and
    CLIs that rebuild it from scratch every process are unusable without
    this.  Same cache dir as tests/conftest.py; opt out with
    OTPOSE_NO_JAX_CACHE=1 (e.g. when timing cold compiles).
    """
    if os.environ.get("OTPOSE_NO_JAX_CACHE") == "1":
        return
    import jax

    cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "otpose_tpu", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)


def ensure_live_backend(verbose: bool = True) -> str:
    """Pin JAX to CPU if the axon TPU relay is unreachable.

    Returns the platform that will be used ("axon" or "cpu").  Must run
    before the first JAX backend initialization; the axon plugin ignores
    later changes (and ignores JAX_PLATFORMS entirely, so the fallback goes
    through ``jax.config.update`` as CLAUDE.md documents).

    Also enables the persistent compilation cache (see
    ``enable_compile_cache``) — every unattended entry point wants both.
    The relay port probe runs *before* anything imports jax, so the guard
    does not depend on ``import jax`` staying hang-safe (it currently is —
    only backend init dials the tunnel — but plugin import behavior is not
    ours to rely on).
    """
    if not _axon_requested():
        platforms = os.environ.get("JAX_PLATFORMS", "cpu") or "cpu"
        if os.environ.get("PALLAS_AXON_TPU_GEN"):
            # the axon plugin ignores the JAX_PLATFORMS env var entirely; a
            # non-axon request must be pinned through jax.config to stick
            import jax

            jax.config.update("jax_platforms", "cpu")
        enable_compile_cache()
        return platforms
    if axon_relay_alive():
        enable_compile_cache()
        return "axon"
    import jax

    jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()
    if verbose:
        import sys

        print("[otpose_tpu] axon TPU relay (port %d) unreachable; "
              "falling back to CPU backend" % _AXON_RELAY_PORT,
              file=sys.stderr)
    return "cpu"
