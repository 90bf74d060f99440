import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otpose_tpu.engine.optim import (classify_param, linear_warmup_cosine_schedule,
                                     make_optimizer, make_schedule)
from otpose_tpu.engine.trainer import init_train_state, make_eval_step, make_train_step
from otpose_tpu.models.otpose import OTPoseSpec, init_otpose
from otpose_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from otpose_tpu.utils.testing import tiny_otpose_cfg


def _make_batch(rng, b, img=32, hm=8, j=17):
    return {
        "inputs": rng.randn(b, img, img, 15).astype(np.float32),
        "margin": np.ones((b, 4), np.float32),
        "target": rng.rand(b, hm, hm, j).astype(np.float32),
        "target_weight": np.ones((b, j, 1), np.float32),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_otpose_cfg(image_size=32, heatmap_size=8)
    spec = OTPoseSpec.from_cfg(cfg)
    params, model_state = init_otpose(jax.random.PRNGKey(0), spec)
    return cfg, spec, params, model_state


def test_classify_param():
    assert classify_param("rough_pose_estimation_net.conv1.weight") == "pretrained"
    assert classify_param("final_layer1.bias") == "no_decay"
    assert classify_param("temporal_encoder1.stem.0.ln1.weight") == "no_decay"
    assert classify_param("temporal_encoder1.stem.0.attn.query_norm.weight") == "no_decay"
    assert classify_param("temporal_encoder1.stem.0.drop_path_attn.scale") == "no_decay"
    assert classify_param("temporal_encoder1.stem.0.attn.query.weight") == "decay"
    assert classify_param("def_fuse.layers.0.conv_bn_relu1.bn.weight") == "decay"
    assert classify_param("offsets_list.0.0.weight") == "decay"
    assert classify_param("modulated_deform_conv_list.0.deform_conv.weight") == "decay"


def test_classify_param_modulelist_layernorm():
    """ModuleList-held LayerNorms ('...embd_norm.0.weight') must land in
    no_decay like every other nn.LayerNorm (ref: train_utils.py:88-101);
    round-1 only matched parts[-2]."""
    assert classify_param("temporal_encoder1.embd_norm.0.weight") == "no_decay"
    assert classify_param("temporal_encoder1.embd_norm.0.bias") == "no_decay"
    assert classify_param("flow_encoder.embd_norm.1.weight") == "no_decay"
    # conv weights next to them still decay
    assert classify_param("temporal_encoder1.embd.0.weight") == "decay"


@pytest.mark.slow
def test_freeze_hrnet_weights():
    """MODEL.FREEZE_HRNET_WEIGHTS: HRNet params AND BN running stats are
    bit-identical after a train step while the heads move
    (ref: OTPose.py:502-503, HRNet.py:154-158)."""
    import dataclasses

    cfg = tiny_otpose_cfg(image_size=32, heatmap_size=8)
    cfg.MODEL.FREEZE_HRNET_WEIGHTS = True
    spec = OTPoseSpec.from_cfg(cfg)
    assert spec.freeze_hrnet
    params, model_state = init_otpose(jax.random.PRNGKey(0), spec)
    schedule = make_schedule(cfg, num_iters_per_epoch=5)
    optimizer = make_optimizer(params, cfg, schedule)
    ts = init_train_state(params, model_state, optimizer)
    step_fn = make_train_step(spec, optimizer, donate=False)
    batch = _make_batch(np.random.RandomState(3), 2)
    ts2 = ts
    for i in range(2):  # warmup LR is 0 at step 0; take 2 steps
        ts2, metrics = step_fn(ts2, batch, jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["final_loss"]))

    frozen_p = [k for k in params if k.startswith("rough_pose_estimation_net.")]
    frozen_s = [k for k in model_state
                if k.startswith("rough_pose_estimation_net.")]
    assert frozen_p and frozen_s
    for k in frozen_p:
        np.testing.assert_array_equal(np.asarray(ts2.params[k]),
                                      np.asarray(params[k]), err_msg=k)
    for k in frozen_s:
        np.testing.assert_array_equal(np.asarray(ts2.model_state[k]),
                                      np.asarray(model_state[k]), err_msg=k)
    # non-frozen heads still train
    assert not np.allclose(np.asarray(ts2.params["final_layer1.weight"]),
                           np.asarray(params["final_layer1.weight"]))
    # and unfrozen spec does move HRNet params (sanity of the test itself)
    spec_u = dataclasses.replace(spec, freeze_hrnet=False)
    cfg.MODEL.FREEZE_HRNET_WEIGHTS = False
    opt_u = make_optimizer(params, cfg, schedule)
    ts_u = init_train_state(params, model_state, opt_u)
    step_u = make_train_step(spec_u, opt_u, donate=False)
    ts_u2 = ts_u
    for i in range(2):
        ts_u2, _ = step_u(ts_u2, batch, jax.random.PRNGKey(i))
    moved = any(
        not np.array_equal(np.asarray(ts_u2.params[k]), np.asarray(params[k]))
        for k in frozen_p)
    assert moved


def test_schedule_matches_reference_closed_form():
    torch = pytest.importorskip("torch")
    import importlib.util
    import os
    path = "/root/reference/thirdparty/utils/lr_schedulers.py"
    if not os.path.isfile(path):
        pytest.skip("reference scheduler not available")
    # load by file path: the thirdparty package __init__ needs the CUDA ext
    spec = importlib.util.spec_from_file_location("ref_lr_schedulers", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    LinearWarmupCosineAnnealingLR = mod.LinearWarmupCosineAnnealingLR
    base_lr, warmup, total = 1e-4, 10, 50
    layer = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(layer.parameters(), lr=base_lr)
    sched = LinearWarmupCosineAnnealingLR(opt, warmup, total)
    ours = linear_warmup_cosine_schedule(base_lr, warmup, total)
    for step in range(total):
        lr_ref = opt.param_groups[0]["lr"]
        lr_ours = float(ours(step))
        assert lr_ours == pytest.approx(lr_ref, rel=1e-4, abs=1e-12), step
        sched.step()


def test_train_step_decreases_loss(setup):
    cfg, spec, params, model_state = setup
    schedule = make_schedule(cfg, num_iters_per_epoch=5)
    optimizer = make_optimizer(params, cfg, schedule)
    ts = init_train_state(params, model_state, optimizer)
    step_fn = make_train_step(spec, optimizer, donate=False)
    rng = np.random.RandomState(0)
    batch = _make_batch(rng, 2)
    losses = []
    for i in range(4):
        ts, metrics = step_fn(ts, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["final_loss"]))
    assert all(np.isfinite(losses))
    assert int(ts.step) == 4
    # params changed
    assert not np.allclose(np.asarray(ts.params["final_layer1.weight"]),
                           np.asarray(params["final_layer1.weight"]))


@pytest.mark.slow
def test_grad_accumulation_matches_micro_loop(setup):
    """accum_steps=K must equal the hand-rolled oracle: K sequential
    micro-batch grad computations (threading BN state, per-micro rng fold),
    averaged, one optimizer update — and the K=1 fast path is untouched."""
    import optax

    from otpose_tpu.engine.trainer import compute_losses
    from otpose_tpu.models.core import Ctx

    cfg, spec, params, model_state = setup
    schedule = make_schedule(cfg, num_iters_per_epoch=5)
    optimizer = make_optimizer(params, cfg, schedule)
    K, micro = 3, 2
    batch = _make_batch(np.random.RandomState(11), K * micro)
    rng = jax.random.PRNGKey(42)

    step_acc = make_train_step(spec, optimizer, donate=False, accum_steps=K)
    ts = init_train_state(params, model_state, optimizer)
    ts_acc, m_acc = step_acc(ts, batch, rng)

    # oracle: independent python loop over the same micro-batches
    def loss_fn(p, st, mb, r):
        ctx = Ctx(p, st, train=True, rng=r)
        total, (metrics, _) = compute_losses(ctx, mb, spec, 8, True)
        return total, (metrics, ctx.finalize_state())

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    state = model_state
    g_sum = None
    loss_sum = 0.0
    for i in range(K):
        mb = {k: v[i * micro:(i + 1) * micro] for k, v in batch.items()}
        (_, (m, state)), g = grad_fn(params, state, mb,
                                     jax.random.fold_in(rng, i))
        loss_sum += float(m["final_loss"])
        g_sum = g if g_sum is None else jax.tree_util.tree_map(jnp.add, g_sum, g)
    grads = jax.tree_util.tree_map(lambda x: x / K, g_sum)
    updates, _ = optimizer.update(grads, optimizer.init(params), params)
    want_params = optax.apply_updates(params, updates)

    assert float(m_acc["final_loss"]) == pytest.approx(loss_sum / K, rel=1e-6)
    for k in want_params:
        np.testing.assert_allclose(np.asarray(ts_acc.params[k]),
                                   np.asarray(want_params[k]),
                                   rtol=0, atol=1e-6, err_msg=k)
    # BN running stats threaded through all K micro-batches
    for k in state:
        np.testing.assert_allclose(np.asarray(ts_acc.model_state[k]),
                                   np.asarray(state[k]),
                                   rtol=0, atol=1e-6, err_msg=k)


def test_grad_accumulation_rejects_indivisible_batch(setup):
    cfg, spec, params, model_state = setup
    schedule = make_schedule(cfg, num_iters_per_epoch=5)
    optimizer = make_optimizer(params, cfg, schedule)
    step_acc = make_train_step(spec, optimizer, donate=False, accum_steps=3)
    ts = init_train_state(params, model_state, optimizer)
    with pytest.raises(ValueError, match="not divisible"):
        step_acc(ts, _make_batch(np.random.RandomState(1), 4),
                 jax.random.PRNGKey(0))


def test_eval_step(setup):
    cfg, spec, params, model_state = setup
    eval_fn = make_eval_step(spec)
    batch = _make_batch(np.random.RandomState(1), 2)
    preds, teacher = eval_fn(params, model_state, batch)
    assert preds.shape == (2, 8, 8, 17)
    assert teacher.shape == (2, 8, 8, 17)


def test_data_parallel_matches_single_device(setup):
    """Same step on an 8-device mesh and on one device -> same loss/params
    (SURVEY.md §4 distributed test)."""
    cfg, spec, params, model_state = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    schedule = make_schedule(cfg, num_iters_per_epoch=5)
    optimizer = make_optimizer(params, cfg, schedule)
    step_fn = make_train_step(spec, optimizer, donate=False)
    batch = _make_batch(np.random.RandomState(2), 8)
    rng = jax.random.PRNGKey(0)

    # single device
    ts1 = init_train_state(params, model_state, optimizer)
    ts1, m1 = step_fn(ts1, jax.tree_util.tree_map(jnp.asarray, batch), rng)

    # 8-device mesh
    mesh = make_mesh(cfg)
    with jax.sharding.set_mesh(mesh):
        ts8 = init_train_state(replicate(mesh, params), replicate(mesh, model_state),
                               optimizer)
        ts8, m8 = step_fn(ts8, shard_batch(mesh, batch), rng)

    assert float(m1["final_loss"]) == pytest.approx(float(m8["final_loss"]), rel=2e-4)
    w1 = np.asarray(ts1.params["final_layer1.weight"])
    w8 = np.asarray(ts8.params["final_layer1.weight"])
    np.testing.assert_allclose(w1, w8, atol=5e-6)


@pytest.mark.slow
def test_grad_accumulation_composes_with_data_parallel(setup):
    """accum_steps under an 8-device data mesh == accum_steps on one device
    (each micro-batch is itself data-sharded; the in-step reshape
    (B,...) -> (K, B/K, ...) must not change the math)."""
    cfg, spec, params, model_state = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    schedule = make_schedule(cfg, num_iters_per_epoch=5)
    optimizer = make_optimizer(params, cfg, schedule)
    step_fn = make_train_step(spec, optimizer, donate=False, accum_steps=2)
    batch = _make_batch(np.random.RandomState(13), 16)  # 2 micro x 8 devices
    rng = jax.random.PRNGKey(3)

    ts1 = init_train_state(params, model_state, optimizer)
    ts1, m1 = step_fn(ts1, jax.tree_util.tree_map(jnp.asarray, batch), rng)

    mesh = make_mesh(cfg)
    with jax.sharding.set_mesh(mesh):
        ts8 = init_train_state(replicate(mesh, params),
                               replicate(mesh, model_state), optimizer)
        ts8, m8 = step_fn(ts8, shard_batch(mesh, batch), rng)

    assert float(m1["final_loss"]) == pytest.approx(float(m8["final_loss"]),
                                                    rel=2e-4)
    w1 = np.asarray(ts1.params["final_layer1.weight"])
    w8 = np.asarray(ts8.params["final_layer1.weight"])
    np.testing.assert_allclose(w1, w8, atol=5e-6)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ge.dryrun_multichip(8)


def test_flip_eval_step(setup):
    """Flip-test averaging: symmetric under input mirroring by construction."""
    from otpose_tpu.engine.runner import make_flip_eval_step

    cfg, spec, params, model_state = setup
    fn = make_flip_eval_step(spec)
    batch = _make_batch(np.random.RandomState(5), 2)
    out, teacher = fn(params, model_state,
                      {k: jnp.asarray(batch[k]) for k in ("inputs", "margin")})
    assert out.shape == (2, 8, 8, 17)
    assert np.isfinite(np.asarray(out)).all()
    # flipping the input flips the (aligned) averaged output up to the
    # one-pixel shift column and the L/R joint swap
    flipped_inputs = batch["inputs"][:, :, ::-1, :]
    out_f, _ = fn(params, model_state,
                  {"inputs": jnp.asarray(flipped_inputs),
                   "margin": jnp.asarray(batch["margin"])})
    from otpose_tpu.data.posetrack import FLIP_PAIRS
    perm = np.arange(17)
    for a, b in FLIP_PAIRS:
        perm[a], perm[b] = perm[b], perm[a]
    back = np.asarray(out_f)[:, :, ::-1, :][..., perm]
    # interior columns match after unflip+swap (borders differ by the shift)
    np.testing.assert_allclose(back[:, :, 2:-2, :],
                               np.asarray(out)[:, :, 2:-2, :], atol=2e-2)


def test_device_pck_matches_host(setup):
    from otpose_tpu.evaluate.pck import accuracy, accuracy_device

    rng = np.random.RandomState(7)
    pred = rng.rand(3, 8, 8, 17).astype(np.float32)
    tgt = rng.rand(3, 8, 8, 17).astype(np.float32)
    avg_d, cnt_d = accuracy_device(jnp.asarray(pred), jnp.asarray(tgt))
    _, avg_h, cnt_h, _ = accuracy(pred.transpose(0, 3, 1, 2),
                                  tgt.transpose(0, 3, 1, 2))
    assert float(avg_d) == pytest.approx(avg_h, abs=1e-6)
    assert int(cnt_d) == cnt_h


@pytest.mark.slow
def test_graft_entry_dryrun_flagship():
    """VERDICT r1 task 7b: sharded compilation + one executed train step at
    the SHIPPED spec (HRNet-W48, 96x72 heatmaps, 5 dilations, batch 8 over
    8 virtual devices).  Slow: full-module XLA CPU compile dominates."""
    import __graft_entry__ as ge
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ge.dryrun_multichip(8, flagship=True)


@pytest.mark.slow
def test_seq_parallel_matches_single_device(setup):
    """dp x sp: batch on 'data' AND tokens on 'seq' (the conv-transformer
    T axis, models/conv_transformer.py::_seq_shard) must reproduce the
    single-device step — XLA SPMD inserts the halo exchanges / psums."""
    cfg, spec, params, model_state = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    schedule = make_schedule(cfg, num_iters_per_epoch=5)
    optimizer = make_optimizer(params, cfg, schedule)
    batch = _make_batch(np.random.RandomState(7), 4)
    rng = jax.random.PRNGKey(3)

    step_1 = make_train_step(spec, optimizer, donate=False)
    ts1 = init_train_state(params, model_state, optimizer)
    ts1, m1 = step_1(ts1, jax.tree_util.tree_map(jnp.asarray, batch), rng)

    cfg2 = cfg.clone()
    cfg2.TPU.MESH_AXES = ["data", "seq"]
    cfg2.TPU.MESH_SHAPE = [2, 4]
    mesh = make_mesh(cfg2)
    step_sp = make_train_step(spec, optimizer, donate=False, seq_axis="seq")
    with jax.sharding.set_mesh(mesh):
        ts2 = init_train_state(replicate(mesh, params),
                               replicate(mesh, model_state), optimizer)
        ts2, m2 = step_sp(ts2, shard_batch(mesh, batch), rng)

    assert float(m1["final_loss"]) == pytest.approx(float(m2["final_loss"]),
                                                    rel=2e-4)
    np.testing.assert_allclose(
        np.asarray(ts1.params["final_layer1.weight"]),
        np.asarray(ts2.params["final_layer1.weight"]), atol=5e-6)


def test_seq_parallel_eval_matches_single_device(setup):
    """Eval forward under the dp x sp mesh reproduces single-device heatmaps."""
    cfg, spec, params, model_state = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    batch = _make_batch(np.random.RandomState(9), 4)
    batch = {k: jnp.asarray(batch[k]) for k in ("inputs", "margin")}

    ref, _ = make_eval_step(spec)(params, model_state, batch)

    cfg2 = cfg.clone()
    cfg2.TPU.MESH_AXES = ["data", "seq"]
    cfg2.TPU.MESH_SHAPE = [2, 4]
    mesh = make_mesh(cfg2)
    fn = make_eval_step(spec, seq_axis="seq")
    with jax.sharding.set_mesh(mesh):
        out, _ = fn(replicate(mesh, params), replicate(mesh, model_state),
                    shard_batch(mesh, batch))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_sharded_fused_decoded_eval_matches_plain(setup):
    """``make_decoded_eval_step(mesh=...)`` wraps the eval step in shard_map
    over the data axis so the Pallas fused kernels run per-device (no GSPMD
    rule exists for the custom calls under plain jit; eval is purely
    data-parallel).  Outputs must match the plain path, and non-divisible
    batches must dispatch to the plain-jit fallback."""
    from otpose_tpu.engine.trainer import make_decoded_eval_step

    cfg, spec, params, model_state = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    batch = _make_batch(np.random.RandomState(9), 8)
    fwd = {k: jnp.asarray(batch[k]) for k in ("inputs", "margin")}
    fwd5 = {k: v[:5] for k, v in fwd.items()}
    plain = make_decoded_eval_step(spec)
    outs_p = plain(params, model_state, fwd)
    outs_p5 = plain(params, model_state, fwd5)

    mesh = make_mesh(cfg)
    with jax.sharding.set_mesh(mesh):
        sharded = make_decoded_eval_step(spec, mesh=mesh, fused=True)
        p8 = replicate(mesh, params)
        s8 = replicate(mesh, model_state)
        outs_s = sharded(p8, s8, shard_batch(mesh, fwd))
        outs_f = sharded(p8, s8, replicate(mesh, fwd5))  # fallback path

    for got, want in zip(outs_s, outs_p):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
    for got, want in zip(outs_f, outs_p5):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
