"""Warm-start TemporalCRN_spk from the parity_r3 flagship checkpoint.

Builds the spk model's parameter template from config_spk.yaml, merges
every leaf the flagship checkpoint provides (the full unconditioned
CRN), keeps the fresh init for the leaves only the spk variant has (the
``spk`` subtree: enrollment MLP + zero-init FiLM), and writes a
weights-only checkpoint directory that ``train.py --resume True`` can
continue from (fresh optimizer state, counters realigned — the
warm-start branch in train/processor.py load_modules).

Because the FiLM tables are zero-initialized (gamma=1, beta=0), the
merged model is functionally IDENTICAL to the flagship at step 0 —
verified here by comparing realtime_process outputs before writing.

Run CPU-only: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/warmstart_spk.py
"""

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from semi_tpu.models import build_model
from semi_tpu.train.checkpoint import load_pytree, save_pytree
from semi_tpu.utils.config import load_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="./config_spk.yaml")
    ap.add_argument("--src", default="./modules/denoise/parity_r3",
                    help="source checkpoint dir (<src_model>.npz)")
    ap.add_argument("--dst", default="./modules/denoise/spk_r3")
    ap.add_argument("--model", default="TemporalCRN_spk",
                    help="destination model registry name")
    ap.add_argument("--src_model", default="TemporalCRN",
                    help="source model registry name (its npz is merged; "
                    "identity is checked against it). E.g. build "
                    "TemporalCRN_spk_deep from a trained TemporalCRN_spk: "
                    "the deep variant's film_enc tables are zero-init, so "
                    "the merge is function-identical to the source.")
    args = ap.parse_args()

    cfg = load_config(args.config)
    spk = build_model(args.model, cfg[args.model])
    params = spk.init(jax.random.PRNGKey(cfg["config"]["seed"]))

    src_npz = os.path.join(args.src, args.src_model + ".npz")
    data = np.load(src_npz)
    merged, fresh = 0, []
    paths, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = []
    for key_path, tmpl in paths:
        key = jax.tree_util.keystr(key_path)
        if key in data.files:
            arr = data[key]
            assert tuple(arr.shape) == tuple(np.shape(tmpl)), (
                f"shape mismatch for {key}: {arr.shape} vs {np.shape(tmpl)}")
            leaves.append(jnp.asarray(arr, jnp.asarray(tmpl).dtype))
            merged += 1
        else:
            leaves.append(tmpl)
            fresh.append(key)
    out = jax.tree_util.tree_unflatten(treedef, leaves)
    assert all(k.startswith("['spk']") for k in fresh), (
        f"unexpected fresh leaves outside the spk subtree: {fresh}")
    assert merged == len(data.files), "flagship leaves left unconsumed"

    # functional-identity check: zero-init FiLM must make the merged spk
    # model reproduce the source model exactly
    flag = build_model(args.src_model, cfg[args.src_model])
    fparams = jax.tree_util.tree_map(
        jnp.asarray, load_pytree(src_npz, flag.init(jax.random.PRNGKey(0))))
    key = jax.random.PRNGKey(1)
    mics = jax.random.normal(key, (1, spk.num_inputs, 16000)) * 0.05
    enroll = jax.random.normal(jax.random.fold_in(key, 1),
                               (1, 1, 16000)) * 0.05
    mix = jnp.concatenate([mics, enroll], axis=1)
    src_in = mix if getattr(flag, "wants_enroll", False) else mics
    y_flag, _ = flag.realtime_process(fparams, None, src_in, False)
    y_spk, _ = spk.realtime_process(out, None, mix, False)
    err = float(jnp.max(jnp.abs(y_flag - y_spk)))
    print(f"identity check: max|{args.src_model} - warmstart| = {err:.3e}")
    assert err < 1e-5, "zero-init FiLM did not reproduce the source model"

    os.makedirs(args.dst, exist_ok=True)
    # ADVICE r3 (medium): a stale fine-tune optimizer.npz / mid-epoch
    # Step.json left behind from a previous run of the SAME dst would be
    # paired with the freshly reset weights/counters by load_modules — a
    # silently inconsistent resume. Remove them with the warm start.
    for stale in ("optimizer.npz", "Step.json"):
        p = os.path.join(args.dst, stale)
        if os.path.exists(p):
            os.remove(p)
            print(f"removed stale {stale} from {args.dst}")
    save_pytree(os.path.join(args.dst, args.model + ".npz"), out)
    # counters copied verbatim: epoch plan continues 48 -> num_epoch;
    # reset_best_dev in the config re-arms the gate at first dev epoch
    shutil.copy(os.path.join(args.src, "Epoch.json"),
                os.path.join(args.dst, "Epoch.json"))
    with open(os.path.join(args.src, "Epoch.json")) as f:
        print(f"counters: {json.load(f)}")
    print(f"wrote {args.dst} ({merged} merged leaves, "
          f"{len(fresh)} fresh spk leaves)")


if __name__ == "__main__":
    main()
