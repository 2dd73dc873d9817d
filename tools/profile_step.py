"""Profile the headline train step on TPU and print the device-op breakdown.

Captures a 3-step `jax.profiler.trace` (works through remote-compile
tunnels), then aggregates the Chrome-trace device lane by op name. Use the
printed `metadata.op_name` of hot fusions (grep the compiled HLO from
`--dump-hlo`) to map fusions back to model source lines.

Usage: python tools/profile_step.py [--logdir DIR] [--dump-hlo PATH]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE = (20, 64, 128, 3)


def build_step(model: str = "fno"):
    """Build the train step for any model_bench family at reference scale."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realpdebench_tpu.config import Config
    from realpdebench_tpu.data.normalizer import IdentityNormalizer
    from realpdebench_tpu.models.registry import build_model
    from realpdebench_tpu.train.train_step import (
        TrainState, build_optimizer, make_train_step,
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from model_bench import MODELS

    spec = MODELS[model]
    batch = spec["batch"]
    b = build_model(shapes=(SHAPE, SHAPE), **spec["kw"])
    v = b.init(jax.random.PRNGKey(0), np.zeros((1, *SHAPE), np.float32))
    p, ms = b.split_variables(v)
    cfg = Config(lr=1e-4, scheduler="cosine", num_update=100,
                 clip_grad_norm=0.0)
    state = TrainState.create(p, ms, build_optimizer(cfg))
    state = jax.device_put(state, jax.devices()[0])
    step = make_train_step(b, IdentityNormalizer(), grad_accum=spec["accum"])
    k = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(k, (batch, *SHAPE),
                                            jnp.float32))(k)
    y = jax.jit(lambda k: jax.random.normal(k, (batch, *SHAPE),
                                            jnp.float32))(jax.random.PRNGKey(1))
    return step, state, x, y, k


def summarize(logdir: str, top: int = 25):
    import re

    traces = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not traces:
        print("no trace found under", logdir)
        return
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n.upper()}
    tot, cnt = collections.Counter(), collections.Counter()
    for e in events:
        if e.get("ph") == "X" and (not dev or e.get("pid") in dev):
            tot[e.get("name", "")] += e.get("dur", 0)
            cnt[e.get("name", "")] += 1
    # the outer jit__step / while wrappers double-count their children;
    # drop container events from the leaf accounting
    leaf_tot = {n: d for n, d in tot.items()
                if not (n.startswith("jit_") or n.startswith("while")
                        or n.isdigit())}
    total = sum(leaf_tot.values())
    print(f"device op time: {sum(tot.values()) / 1e3:.1f} ms "
          f"({sum(cnt.values())} events); leaf ops {total / 1e3:.1f} ms")
    run = 0
    for name, d in sorted(leaf_tot.items(), key=lambda kv: -kv[1])[:top]:
        run += d
        print(f"{d / 1e3:9.2f} ms {cnt[name]:5d}x {100 * d / total:5.1f}% "
              f"cum {100 * run / total:5.1f}%  {name[:90]}")
    # grouped view: strip trailing .NNN ids so 40 conv fusions roll up
    groups = collections.Counter()
    gcnt = collections.Counter()
    for n, d in leaf_tot.items():
        g = re.sub(r"[.\d]+$", "", n) or n
        groups[g] += d
        gcnt[g] += cnt[n]
    print("-- grouped by op family --")
    run = 0
    for g, d in groups.most_common(25):
        run += d
        print(f"{d / 1e3:9.2f} ms {gcnt[g]:5d}x {100 * d / total:5.1f}% "
              f"cum {100 * run / total:5.1f}%  {g[:90]}")


def build_rollout(model: str = "fno"):
    """The bench.py rollout (scan of eval forwards) at bench shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realpdebench_tpu.data.normalizer import IdentityNormalizer
    from realpdebench_tpu.eval.rollout import make_rollout_fn
    from realpdebench_tpu.models.registry import build_model
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from model_bench import MODELS

    spec = MODELS[model]
    b = build_model(shapes=(SHAPE, SHAPE), **spec["kw"])
    v = b.init(jax.random.PRNGKey(0), np.zeros((1, *SHAPE), np.float32))
    n_steps, batch = 10, 8  # bench.py N_AUTOREGRESSIVE / EVAL_BATCH
    roll = make_rollout_fn(b, IdentityNormalizer(), n_steps)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.jit(lambda k: jax.random.normal(
        k, (batch, *SHAPE), jnp.float32))(k1)
    y = jax.jit(lambda k: jax.random.normal(
        k, (batch, SHAPE[0] * n_steps, *SHAPE[1:]), jnp.float32))(k2)
    return roll, v, x, y, k3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/jax_trace")
    ap.add_argument("--dump-hlo", default=None,
                    help="also write the compiled HLO text here")
    ap.add_argument("--model", default="fno",
                    help="model_bench family to profile (default fno)")
    ap.add_argument("--rollout", action="store_true",
                    help="profile the eval rollout instead of the train step")
    a = ap.parse_args()

    import jax

    if a.rollout:
        roll, v, x, y, k = build_rollout(a.model)
        pred, _, _ = roll(v, x, y, k)  # compile + warm
        jax.block_until_ready(pred)
        with jax.profiler.trace(a.logdir):
            for _ in range(3):
                pred, xn, yn = roll(v, x, y, k)
            _ = float(jax.device_get(pred[0, 0, 0, 0, 0]))
        summarize(a.logdir, top=40)
        return

    step, state, x, y, k = build_step(a.model)
    if a.dump_hlo:
        txt = jax.jit(step).lower(state, x, y, k).compile().as_text()
        with open(a.dump_hlo, "w") as f:
            f.write(txt)
        print("HLO written:", a.dump_hlo, len(txt), "chars")
    state, loss = step(state, x, y, k)  # compile + warm
    state, loss = step(state, x, y, k)
    print("warm loss:", float(jax.device_get(loss)))
    with jax.profiler.trace(a.logdir):
        for _ in range(3):
            state, loss = step(state, x, y, k)
        _ = float(jax.device_get(loss))
    summarize(a.logdir)


if __name__ == "__main__":
    main()
