"""Multi-host execution validation: the full sharded train step across
N coordinated processes (SURVEY §2.7/§5.8).

The single-host 8-virtual-device dryrun (__graft_entry__.py) proves the
mesh/sharding program compiles and runs, but cannot exercise the
cross-HOST mechanics: `jax.distributed` coordination, per-process input
assembly (`make_array_from_callback` over a global mesh where most
devices are NOT addressable locally), and collectives that ride a
cross-process transport (Gloo on CPU here; ICI/DCN on real pods).
This tool runs exactly that on one machine:

    python tools/run_multihost.py            # 2 procs x 4 devices
    python tools/run_multihost.py --procs 4  # 4 procs x 2 devices

Launcher mode spawns N worker subprocesses (each `JAX_PLATFORMS=cpu`
with 8//N local virtual devices + `jax.distributed.initialize`), plus
one single-process 8-device reference run, then asserts:
  - every worker computes the SAME replicated loss / updated-param
    checksum (the gradient psum crossed process boundaries correctly);
  - the multi-process result matches the single-process reference
    (per-host input assembly reproduces the global serial batch).

Exit 0 = multi-host path validated. tests/test_multihost_exec.py runs
this under pytest.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
GLOBAL_DEVICES = 8
GLOBAL_BATCH = 8


# ---------------------------------------------------------------- worker
def worker(pid: int, procs: int, port: int) -> None:
    import jax

    if procs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=procs, process_id=pid)
    assert jax.process_count() == procs, (jax.process_count(), procs)
    assert jax.device_count() == GLOBAL_DEVICES

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from semi_tpu.models.crn import TemporalCRN
    from semi_tpu.parallel.mesh import make_mesh, state_sharding
    from semi_tpu.train.step import init_train_state, make_train_step

    mesh = make_mesh(GLOBAL_DEVICES)
    dp = lambda ndim: NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))
    rep = NamedSharding(mesh, P())

    def globalize(tree, shard_of):
        """Assemble global arrays from host-replicated full values.

        Every process holds the full (deterministically generated)
        value; `make_array_from_callback` hands each ADDRESSABLE device
        its shard — the per-host input-assembly path a real pod uses
        (each host materializes only its slice of the global batch).
        """
        def one(x):
            x = np.asarray(x)
            sh = shard_of(x)
            return jax.make_array_from_callback(x.shape, sh,
                                                lambda idx: x[idx])
        return jax.tree.map(one, tree)

    model = TemporalCRN(
        num_channels=[4, 8], num_freqs=201, hidden=16,
        segment_length=3200, num_layers=1, num_inputs=3, kernel_size=3,
    )
    params = model.init(jax.random.PRNGKey(0))
    ts = init_train_state(params, lr=3e-4)
    step = make_train_step(model, accum_every=2)

    b = GLOBAL_BATCH
    batch = {
        "mix": jax.random.normal(jax.random.PRNGKey(1), (b, 3, 3200)) * 0.1,
        "source": jax.random.normal(jax.random.PRNGKey(2), (b, 3200)) * 0.1,
        "length": jnp.full((b,), 3200, jnp.int32),
    }

    batch = globalize(batch, lambda x: dp(x.ndim))
    ts = globalize(ts, lambda x: rep)
    model_state = globalize(model.init_state(b),
                            lambda x: state_sharding(mesh, x, b))

    def checksum(tree):
        return sum(jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
                   for leaf in jax.tree.leaves(tree))

    jit_step = jax.jit(step, static_argnums=3)
    with mesh:
        ts2, ms2, m1 = jit_step(ts, model_state, batch, False)
        _, _, m2 = jit_step(ts2, ms2, batch, True)  # flag continuation
        csum = jax.jit(checksum)(ts2.params)

    def scalar(x):  # replicated scalar -> host float on any process
        return float(np.asarray(x.addressable_shards[0].data).ravel()[0])

    # -- fused utterance engine across processes (round 4) ------------
    # The PRODUCTION engine (train/utterance.py: on-device mix + stream
    # + grads + optimizer in one program) sharded over the same global
    # mesh: B utterance streams on dp, TrainState replicated, input
    # blocks assembled per host exactly like a pod would.
    import copy

    from semi_tpu.data.dataset import LibriPartyDataset
    from semi_tpu.train.utterance import (
        UtteranceBatchSampler, make_utterance_train_step)
    from tests.test_trainer import TINY_CONFIG

    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["config"]["mix_length"] = 16000
    ds = LibriPartyDataset(cfg)  # hermetic synthetic source
    ds.set_attribute("train", augment=False)
    ds.init_seed(0)
    # k_batches=2 so the grad-accum window closes and the OPTIMIZER
    # update executes inside the program — ucsum then checks that the
    # gradient all-reduce produced identical new params on every process
    sampler = UtteranceBatchSampler(ds, batch=GLOBAL_BATCH, k_batches=2,
                                    process_index=0, process_count=1)
    try:
        inputs = sampler.next_batch()  # deterministic: identical per host
    finally:
        sampler.close()
    fused = jax.jit(make_utterance_train_step(model, ds, k_batches=2))

    def block_spec(x):  # [K, B, ...]: K = local scan dim, B shards on dp
        spec = [None] * x.ndim
        if x.ndim >= 2:
            spec[1] = "dp"
        return NamedSharding(mesh, P(*spec))

    uts = globalize(init_train_state(params, lr=3e-4), lambda x: rep)
    uinputs = globalize(inputs, block_spec)
    with mesh:
        uts2, ums = fused(uts, uinputs)
        ucsum = jax.jit(checksum)(uts2.params)
        icsum = jax.jit(checksum)(uinputs)  # input-assembly diagnostic

    print(f"MHRESULT pid={pid} procs={procs} "
          f"loss1={scalar(m1['loss']):.10f} loss2={scalar(m2['loss']):.10f} "
          f"csum={scalar(csum):.6f} "
          f"uloss={scalar(ums['loss']):.10f} ucsum={scalar(ucsum):.6f} "
          f"icsum={scalar(icsum):.6f} usisnr={scalar(ums['sisnr']):.10f} "
          f"ustoi={scalar(ums['aux']):.10f}",
          flush=True)


# -------------------------------------------------------------- launcher
def _spawn(pid: int, procs: int, port: int) -> subprocess.Popen:
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count="
                 f"{GLOBAL_DEVICES // procs}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # no TPU-tunnel claim
    env.pop("JAX_PLATFORM_NAME", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(pid),
         "--procs", str(procs), "--port", str(port)],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)

def _parse(out: str, tag: str) -> dict:
    for line in out.splitlines():
        if line.startswith("MHRESULT"):
            return dict(kv.split("=") for kv in line.split()[1:])
    raise RuntimeError(f"{tag} produced no MHRESULT line:\n{out[-3000:]}")


def launch(procs: int, timeout: int = 900) -> None:
    with socket.socket() as s:  # free port for the coordination service
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    ps = [_spawn(pid, procs, port) for pid in range(procs)]
    outs = [p.communicate(timeout=timeout)[0] for p in ps]
    for pid, (p, out) in enumerate(zip(ps, outs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"worker {pid} failed rc={p.returncode}:\n{out[-3000:]}")
    results = [_parse(out, f"worker {pid}")
               for pid, out in enumerate(outs)]

    ref_proc = _spawn(0, 1, port)  # single-process 8-device reference
    ref_out = ref_proc.communicate(timeout=timeout)[0]
    if ref_proc.returncode != 0:
        raise RuntimeError(f"reference failed rc={ref_proc.returncode}:\n"
                           f"{ref_out[-3000:]}")
    ref = _parse(ref_out, "reference")
    print(f"workers: {results}\nreference: {ref}", flush=True)

    # Tolerances. Worker-vs-worker must be BIT-EQUAL: all processes run
    # the same deterministic executable, and any disagreement means the
    # cross-process collectives diverged — the DDP correctness property.
    # 2-proc vs 1-proc are DIFFERENT XLA executables (the partitioner
    # schedules collectives differently per process topology), so f32
    # rounding legitimately differs; the fused engine's mix→stream→
    # si_snr(log-ratio) path amplifies executable-level rounding to
    # ~1e-2 dB (measured: uloss 0.37292 vs 0.37628, usisnr ±0.011 dB,
    # all from the SI-SNR term), so fused fields get a 1e-2 relative
    # cross-topology tolerance while the piece step stays at 1e-5.
    tol = {"loss1": 1e-5, "loss2": 1e-5, "csum": 1e-5,
           "icsum": 1e-6, "uloss": 1e-2, "ucsum": 1e-5,
           "usisnr": 1e-2, "ustoi": 1e-2}
    for key, rel in tol.items():
        vals = [float(r[key]) for r in results]
        if max(vals) - min(vals) > 1e-9:
            raise AssertionError(f"workers disagree on {key}: {vals}")
        rv = float(ref[key])
        if abs(vals[0] - rv) > max(rel, rel * abs(rv)):
            raise AssertionError(
                f"{procs}-process {key}={vals[0]} != single-process {rv}")

    print(f"multihost ok: {procs} processes x {GLOBAL_DEVICES // procs} "
          f"devices == 1 process x {GLOBAL_DEVICES} devices "
          f"(loss {results[0]['loss1']}, csum {results[0]['csum']})")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=0)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.procs, args.port)
    else:
        launch(args.procs)


if __name__ == "__main__":
    main()
