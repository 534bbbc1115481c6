"""Command-line tools mirroring the reference binaries (SURVEY.md §2.1).

Each tool is ``python -m tdoa_tpu.cli.<name>`` with the reference's
argument contract. Tools default to the CPU backend (interactive latency;
the axon TPU tunnel takes minutes to warm) — set ``TDOA_TPU_PLATFORM=tpu``
to run a tool's compute on the TPU.
"""

import os


def setup_compilation_cache() -> None:
    """Point JAX at a persistent on-disk compilation cache.

    Every CLI process pays XLA compilation for the pipeline programs it
    runs; on TPU that cold-start is seconds to minutes (BENCHLOG). The
    persistent cache makes the SECOND process with the same shapes
    skip it entirely. Cache dir: ``TDOA_TPU_CACHE_DIR`` if set, else
    ``~/.cache/tdoa_tpu/jax``; ``TDOA_TPU_CACHE_DIR=off`` disables.

    TPU runs only (unless TDOA_TPU_CACHE_DIR is set explicitly):
    XLA:CPU cache entries embed the compiling host's CPU features and
    reloading them on a different host risks SIGILL (and spews loader
    warnings); CPU compiles are cheap enough not to need the cache.
    """
    where = os.environ.get("TDOA_TPU_CACHE_DIR", "")
    if where.lower() in ("off", "0", "none"):
        return
    if not where and os.environ.get("TDOA_TPU_PLATFORM", "cpu") == "cpu":
        return
    if not where:
        where = os.path.join(
            os.path.expanduser("~"), ".cache", "tdoa_tpu", "jax"
        )
    try:
        os.makedirs(where, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", where)
        # Cache every compile: CLI programs are few and small on disk,
        # and even "fast" 0.3 s compiles add up across the tool fleet.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache is an optimization; never block a tool on it


def rewrite_prior_argv(argv):
    """argparse treats "-33.9,18.4,25" (southern-hemisphere prior) as an
    option string, not a value; rewrite to the --prior=VALUE form."""
    argv = list(argv)
    for k, a in enumerate(argv[:-1]):
        if a == "--prior" and argv[k + 1].startswith("-"):
            argv[k:k + 2] = ["--prior=" + argv[k + 1]]
            break
    return argv


def parse_prior(spec, error):
    """Parse a ``LAT,LON,RADIUS_KM`` coverage-prior spec into the
    ``(lat_deg, lon_deg, radius_m)`` tuple ProcessorConfig.prior takes;
    calls ``error(msg)`` (argparse-style, does not return) on bad input."""
    try:
        lat_s, lon_s, rad_s = spec.split(",")
        prior = (float(lat_s), float(lon_s), float(rad_s) * 1000.0)
    except ValueError:
        error("--prior expects LAT,LON,RADIUS_KM (e.g. 41.2,-96.0,25)")
    if not (-90.0 <= prior[0] <= 90.0 and -180.0 <= prior[1] <= 180.0
            and prior[2] > 0.0):
        error("--prior out of range: |lat|<=90, |lon|<=180, radius>0")
    return prior


def setup_platform() -> None:
    """Pick the JAX platform for CLI runs before any computation."""
    setup_compilation_cache()
    want = os.environ.get("TDOA_TPU_PLATFORM", "cpu")
    if want in ("cpu", "tpu", "axon"):
        import jax

        try:
            if want == "cpu":
                jax.config.update("jax_platforms", "cpu")
            # "tpu"/"axon": leave the config alone — the accelerator is
            # already the default backend whatever name its plugin
            # registers under (real hardware: "tpu"; remote tunnel:
            # "axon" via JAX_PLATFORMS). Overriding here would permit a
            # silent CPU fallback the environment deliberately forbids.
        except Exception:
            pass  # platform already initialized; respect it
        if want in ("tpu", "axon"):
            # An explicit TPU request must not silently run on CPU
            # (plugin failed to register, JAX_PLATFORMS=cpu inherited,
            # chip grant held by another process).
            plat = jax.devices()[0].platform.lower()
            if "tpu" not in plat and plat != "axon":
                raise RuntimeError(
                    f"TDOA_TPU_PLATFORM={want} requested but the default "
                    f"JAX backend is '{plat}'. The TPU plugin did not "
                    f"register — check that PYTHONPATH still includes the "
                    f"platform plugin path and that no other process "
                    f"holds the chip, or set TDOA_TPU_PLATFORM=cpu."
                )
