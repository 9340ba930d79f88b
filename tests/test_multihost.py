"""Multi-host utilities on the virtual 8-device CPU mesh (single process,
so DCN axis = 1; the hybrid-mesh DP train step must still compile + run)."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.parallel import mesh as mesh_lib
from tensorflowasr_tpu.parallel.multihost import (
    data_spec,
    host_local_batch,
    initialize,
    make_hybrid_mesh,
    process_batch_slice,
)


def test_initialize_single_process_noop():
    initialize()            # no args -> no-op
    initialize(num_processes=1)


def test_hybrid_mesh_shape():
    mesh = make_hybrid_mesh()
    assert mesh.axis_names == ("dcn_data", "data")
    assert mesh.devices.shape == (1, 8)


def test_process_batch_slice():
    assert process_batch_slice(16) == slice(0, 16)


def test_host_local_batch_and_train_step():
    from tensorflowasr_tpu.models.conformer import (
        ConformerCTC, ConformerConfig)
    from tensorflowasr_tpu.train.asr_trainer import make_train_step
    from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer

    mesh = make_hybrid_mesh()
    cfg = ConformerConfig(dmodel=32, num_blocks=1, head_size=8, num_heads=2,
                          kernel_size=8, ctcdecoder_num_blocks=1,
                          translator_num_blocks=1)
    n_phone, n_char = 10, 14
    model = ConformerCTC(cfg, n_phone, n_char)
    tx = make_optimizer({"lr": 1e-3})
    rng = np.random.default_rng(0)
    b = 8
    batch_np = {
        "wav": rng.standard_normal((b, 4000)).astype(np.float32) * 0.1,
        "input_length": np.full((b,), 7, np.int32),
        "phones": rng.integers(1, n_phone - 1, (b, 4)).astype(np.int32),
        "phone_length": np.full((b,), 4, np.int32),
        "chars": rng.integers(1, n_char, (b, 6)).astype(np.int32),
    }
    batch = host_local_batch(batch_np, mesh)
    assert batch["wav"].sharding.spec == data_spec(mesh)

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(batch_np["wav"][:1]),
                           jnp.asarray(batch_np["phones"][:1]))
    state = ASRTrainState.create(apply_fn=model.apply,
                                 params=variables["params"], tx=tx,
                                 batch_stats=variables.get("batch_stats"))
    state = mesh_lib.replicate(state, mesh)
    step = make_train_step(model, tx, blank_id=n_phone - 1, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["train_loss"]))
