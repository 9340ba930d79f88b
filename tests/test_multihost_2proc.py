"""REAL multi-process jax.distributed test (VERDICT round-1 item 9):
2 processes x 4 virtual CPU devices run one hybrid-mesh DP train step on
the same global batch and must agree with each other AND with a
single-process 8-device run of the identical step (bitwise-deterministic
data, atol for collective reassociation)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = r'''
import os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4")
import jax
# the axon site hook force-sets jax_platforms at import; pin back to cpu
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address={coord!r},
                           num_processes=2,
                           process_id=int(sys.argv[1]))
import jax.numpy as jnp
import numpy as np
from tensorflowasr_tpu.parallel import mesh as mesh_lib
from tensorflowasr_tpu.parallel.multihost import (
    host_local_batch, make_hybrid_mesh, process_batch_slice)
from tensorflowasr_tpu.models.conformer import ConformerCTC, ConformerConfig
from tensorflowasr_tpu.train.asr_trainer import make_train_step
from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
mesh = make_hybrid_mesh()
assert mesh.devices.shape == (2, 4)

cfg = ConformerConfig(dmodel=32, num_blocks=1, head_size=8, num_heads=2,
                      kernel_size=8, ctcdecoder_num_blocks=1,
                      translator_num_blocks=1)
n_phone, n_char = 10, 14
model = ConformerCTC(cfg, n_phone, n_char)
tx = make_optimizer({{"lr": 1e-3}})
rng = np.random.default_rng(0)
b = 8
full = {{
    "wav": rng.standard_normal((b, 4000)).astype(np.float32) * 0.1,
    "input_length": np.full((b,), 7, np.int32),
    "phones": rng.integers(1, n_phone - 1, (b, 4)).astype(np.int32),
    "phone_length": np.full((b,), 4, np.int32),
    "chars": rng.integers(1, n_char, (b, 6)).astype(np.int32),
}}
sl = process_batch_slice(b)
local = {{k: v[sl] for k, v in full.items()}}
batch = host_local_batch(local, mesh)

variables = model.init(jax.random.PRNGKey(0), jnp.asarray(full["wav"][:1]),
                       jnp.asarray(full["phones"][:1]))
state = ASRTrainState.create(apply_fn=model.apply,
                             params=variables["params"], tx=tx,
                             batch_stats=variables.get("batch_stats"))
state = mesh_lib.replicate(state, mesh)
step = make_train_step(model, tx, blank_id=n_phone - 1, donate=False)
state, metrics = step(state, batch, jax.random.PRNGKey(1))
print("LOSS", repr(float(metrics["train_loss"])), flush=True)
jax.distributed.shutdown()
'''


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_hybrid_mesh_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"localhost:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo, coord=coord),
                      encoding="utf-8")

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("LOSS")][-1]
        losses.append(float(line.split()[1]))
    # both processes compute the SAME global loss
    assert losses[0] == pytest.approx(losses[1], abs=1e-6), outs

    # and it matches the identical step on this process's 8-device mesh
    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu.models.conformer import (
        ConformerCTC, ConformerConfig)
    from tensorflowasr_tpu.parallel import mesh as mesh_lib
    from tensorflowasr_tpu.parallel.multihost import (
        host_local_batch, make_hybrid_mesh)
    from tensorflowasr_tpu.train.asr_trainer import make_train_step
    from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer

    cfg = ConformerConfig(dmodel=32, num_blocks=1, head_size=8, num_heads=2,
                          kernel_size=8, ctcdecoder_num_blocks=1,
                          translator_num_blocks=1)
    n_phone, n_char = 10, 14
    model = ConformerCTC(cfg, n_phone, n_char)
    tx = make_optimizer({"lr": 1e-3})
    rng = np.random.default_rng(0)
    b = 8
    full = {
        "wav": rng.standard_normal((b, 4000)).astype(np.float32) * 0.1,
        "input_length": np.full((b,), 7, np.int32),
        "phones": rng.integers(1, n_phone - 1, (b, 4)).astype(np.int32),
        "phone_length": np.full((b,), 4, np.int32),
        "chars": rng.integers(1, n_char, (b, 6)).astype(np.int32),
    }
    mesh = make_hybrid_mesh()          # (1, 8) in-process
    batch = host_local_batch(full, mesh)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(full["wav"][:1]),
                           jnp.asarray(full["phones"][:1]))
    state = ASRTrainState.create(apply_fn=model.apply,
                                 params=variables["params"], tx=tx,
                                 batch_stats=variables.get("batch_stats"))
    state = mesh_lib.replicate(state, mesh)
    step = make_train_step(model, tx, blank_id=n_phone - 1, donate=False)
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    single = float(metrics["train_loss"])
    assert losses[0] == pytest.approx(single, abs=5e-5), (losses, single)
