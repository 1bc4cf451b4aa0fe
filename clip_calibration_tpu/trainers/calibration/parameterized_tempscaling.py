"""Parameterized temperature scaling (PTS).

The reference defines the config tree (``train.py:243-247``:
``CALIBRATION.P_TS.{N_LAYERS, N_NODES, TOP_K_LOGITS}``) and a script
branch (``run/calibration/fewshot_scaling.sh:68-70``) for this calibrator
but never registers an implementation. Implemented here: a per-sample
log-temperature predicted by a small MLP over the sorted top-k logits
(PTS, Tomani et al., ECCV 2022), sharing TempScaling's base-learner
wrapping, data routing, and checkpoint naming.

    logits_calibrated = cos_logits * exp(s0 + MLP(topk(cos_logits)))

with s0 init 4.6052 (ln 100) so it starts exactly at TempScaling's init.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...engine.registry import TRAINER_REGISTRY
from .tempscaling import TempScaling


def pts_log_scale(params, cos_logits: jnp.ndarray) -> jnp.ndarray:
    """[N, C] unit logits -> [N] per-sample log temperature scale.

    The MLP input width is always TOP_K_LOGITS regardless of the class
    count — base-split checkpoints must load into new-split evals whose
    n_cls differs. Fewer classes than k pads the sorted logits with the
    row minimum (preserves the descending structure)."""
    k = params["w_in"].shape[0]
    n_cls = cos_logits.shape[-1]
    if n_cls >= k:
        top = jax.lax.top_k(cos_logits, k)[0]  # sorted descending
    else:
        top = jnp.sort(cos_logits, axis=-1)[..., ::-1]
        top = jnp.concatenate(
            [top, jnp.repeat(top[..., -1:], k - n_cls, axis=-1)],
            axis=-1)
    h = jnp.maximum(jnp.dot(top, params["w_in"]) + params["b_in"], 0)
    # stacked [n_mid, nodes, nodes] hidden layers (possibly n_mid == 0)
    for i in range(params["ws"].shape[0]):
        h = jnp.maximum(jnp.dot(h, params["ws"][i]) + params["bs"][i], 0)
    out = jnp.dot(h, params["w_out"]) + params["b_out"]  # [N, 1]
    return params["s0"] + out[:, 0]


def init_pts_params(k: int, nodes: int, n_layers: int, init_temp: float,
                    seed: int = 0):
    """PTS trainable pytree (shared by build_model and the property
    tests). N_LAYERS hidden layers total: w_in provides the first, the
    stacked mid layers the rest (PTS: nlayers hidden of N_NODES)."""
    ks = jax.random.split(jax.random.PRNGKey(max(seed, 0)), n_layers + 2)

    def lin(key, fan_in, fan_out):
        lim = (1.0 / fan_in) ** 0.5
        return jax.random.uniform(key, (fan_in, fan_out), jnp.float32,
                                  -lim, lim)

    n_mid = max(n_layers - 1, 0)
    mid_ws = (jnp.stack([lin(ks[1 + i], nodes, nodes)
                         for i in range(n_mid)])
              if n_mid else jnp.zeros((0, nodes, nodes), jnp.float32))
    return {
        "s0": jnp.asarray(init_temp, jnp.float32),
        "w_in": lin(ks[0], k, nodes),
        "b_in": jnp.zeros((nodes,), jnp.float32),
        "ws": mid_ws,
        "bs": jnp.zeros((n_mid, nodes), jnp.float32),
        "w_out": lin(ks[-1], nodes, 1) * 0.01,  # start near identity
        "b_out": jnp.zeros((1,), jnp.float32),
    }


@TRAINER_REGISTRY.register()
class ParameterizedTempScaling(TempScaling):

    def build_model(self):
        super().build_model()  # builds base learner + plain scale slot

        cfg = self.cfg
        # fixed width (see pts_log_scale): checkpoints stay loadable
        # across base/new splits with different class counts
        trainable = init_pts_params(
            cfg.CALIBRATION.P_TS.TOP_K_LOGITS,
            cfg.CALIBRATION.P_TS.N_NODES,
            cfg.CALIBRATION.P_TS.N_LAYERS,
            cfg.CALIBRATION.SCALING.INIT_TEMP, seed=cfg.SEED)
        # replace the scalar scale learner registered by TempScaling
        slot = self._models["scale_learner"]
        slot["params"] = trainable
        slot["opt_state"] = self.opt.init(trainable)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def scale_step(trainable, opt_state, cos_logits, labels):
            def loss_fn(tr):
                s = pts_log_scale(tr, cos_logits)
                logits = jnp.exp(s)[:, None] * cos_logits
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()
            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, opt_state = self.opt.update(grads, opt_state,
                                                 trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss

        self._scale_step = scale_step

    def forward_backward(self, batch):
        cos, labels = self._cached_cos(batch)
        slot = self._models["scale_learner"]
        slot["params"], slot["opt_state"], loss = self._scale_step(
            slot["params"], slot["opt_state"], jnp.asarray(cos),
            jnp.asarray(labels))
        return {"loss": loss}

    def model_inference(self, images):
        cos, img_f, txt_f = self._unit_logits(images)
        params = self._models["scale_learner"]["params"]
        s = np.asarray(pts_log_scale(params, jnp.asarray(cos)))
        return cos * np.exp(s)[:, None], img_f, txt_f
