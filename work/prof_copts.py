"""Per-compile XLA compiler-option sweep, in-model.

The r4 discovery: jit(...).lower().compile(compiler_options=...) IS forwarded
to the axon remote TPU compiler and validated there (a bogus name errors) —
unlike env XLA_FLAGS, which the local CPU jaxlib rejects for all xla_tpu_*
names. This is the only route to scheduling/fusion flags on this rig.

Usage:
  python -u work/prof_copts.py validate      # cheap flag-name probe (tiny fn)
  python -u work/prof_copts.py v1 [batch]    # in-model sweep
  python -u work/prof_copts.py v2 [batch]
"""

import dataclasses
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/work")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_lib import chained_time

# Candidate options. Names are guesses validated by the remote compiler
# (unknown -> loud compile error, caught below).
CANDIDATES = {
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": True},
    "vmem96M": {"xla_tpu_scoped_vmem_limit_kib": 98304},
    "vmem64M": {"xla_tpu_scoped_vmem_limit_kib": 65536},
    "conv_in_fusion_off": {"xla_jf_conv_input_fusion": False},
    "conv_out_fusion_off": {"xla_jf_conv_output_fusion": False},
    "dot_dot_fusion_off": {"xla_tpu_dot_dot_fusion": False},
    "dot_dot_dup_off": {"xla_tpu_dot_dot_fusion_duplicated": False},
    "rwb_fusion_off": {"xla_tpu_rwb_fusion": False},
    "licm2": {"xla_tpu_licm_size_inflation_ratio": 2.0},
    "mbl_opt": {"xla_tpu_enable_memory_bound_loop_optimizer": True},
    "flash_attn_off": {"xla_tpu_enable_flash_attention": False},
    "retry_oom": {"xla_tpu_autofdo_profile": ""},  # canary-ish
    "async_dma": {"xla_tpu_enable_async_dma": True},
    "bloat16_all": {"xla_allow_excess_precision": False},
    # r4g: rwb_fusion_off measured +2.5% on v2 (38.9 vs 39.9) — combo probes
    "rwb_off_vmem64M": {"xla_tpu_rwb_fusion": False,
                        "xla_tpu_scoped_vmem_limit_kib": 65536},
    # r4g trace study: the in-model "conv scheduling loss" is relayout copies
    # around XLA's own space-to-batch conv conversion (hlo_map_v1/v2.log) —
    # flag names recovered from libtpu.so strings, remotely validated
    "s2b_off": {"xla_tpu_run_space_to_batch": False},
    "s2b_dots": {"xla_tpu_run_space_to_batch_allow_dots": True},
    "s2b_after_spmd": {"xla_tpu_run_space_to_batch_after_spmd": True},
}


def validate():
    def f(x):
        return x @ x

    x = jnp.ones((256, 256), jnp.bfloat16)
    low = jax.jit(f).lower(x)
    for name, opts in CANDIDATES.items():
        try:
            low.compile(compiler_options=opts)
            print(f"VALID   {name:<22s} {opts}", flush=True)
        except Exception as e:
            print(f"INVALID {name:<22s} {str(e)[:120]}", flush=True)


def sweep(version, batch, names):
    from piv_liteflownet_tpu.models.factory import piv_liteflownet
    from piv_liteflownet_tpu.models.liteflownet import forward

    model = piv_liteflownet(version=version)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
    key = jax.random.PRNGKey(0)
    size = 1024
    img1 = jax.random.uniform(key, (batch, size, size, 3), jnp.bfloat16)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1),
                              (batch, size, size, 3), jnp.bfloat16)
    cfg = model.cfg

    def fn(a, b):
        return forward(params, a, b, cfg, train=False)

    for name in names:
        opts = CANDIDATES.get(name, {}) if name != "baseline" else None
        try:
            t = chained_time(fn, (img1, img2), n_lo=2, n_hi=6,
                             compiler_options=opts) * 1000 / batch
            print(f"v{version} b={batch} {name:<22s}: {t:7.1f} ms/pair = "
                  f"{1000/t:6.2f} pairs/s", flush=True)
        except Exception as e:
            print(f"v{version} b={batch} {name:<22s}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "validate"
    if mode == "validate":
        validate()
    else:
        version = int(mode[1:])
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
        names = sys.argv[3].split(",") if len(sys.argv) > 3 else (
            ["baseline"] + list(CANDIDATES))
        sweep(version, batch, names)
