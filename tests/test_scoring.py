import numpy as np

import jax
import jax.numpy as jnp

from clip_calibration_tpu.ops.scoring import (dac_class_confidence,
                                              fused_dac_scores)
from clip_calibration_tpu.trainers.calibration.dac import (
    DistanceAwareCalibration)


def _features(rng, nb=20, nc=12, d=32):
    base_zs = rng.normal(size=(nb, d))
    base_zs /= np.linalg.norm(base_zs, axis=1, keepdims=True)
    cur_zs = rng.normal(size=(nc, d))
    cur_zs /= np.linalg.norm(cur_zs, axis=1, keepdims=True)
    base_t = base_zs + rng.normal(size=(nb, d)) * 0.1
    cur_t = cur_zs + rng.normal(size=(nc, d)) * 0.1
    cur_t[0] = base_t[3]  # base-class-aware case
    return base_zs, cur_zs, base_t, cur_t


def test_device_dac_fit_matches_host(rng):
    base_zs, cur_zs, base_t, cur_t = _features(rng)
    host = DistanceAwareCalibration()
    host.fit(base_zs, cur_zs, base_t, cur_t, k=5)
    dev = dac_class_confidence(jnp.asarray(base_zs), jnp.asarray(cur_zs),
                               jnp.asarray(base_t), jnp.asarray(cur_t))
    np.testing.assert_allclose(np.asarray(dev), host.class_confidence,
                               rtol=1e-5, atol=1e-6)


def test_fused_scores_match_composed_pipeline(rng):
    from scipy.special import softmax
    from clip_calibration_tpu.models.clip import cosine_logits
    B, C, E = 16, 12, 32
    img_f = rng.normal(size=(B, E)).astype(np.float32)
    txt_f = rng.normal(size=(C, E)).astype(np.float32)
    conf = rng.uniform(0.5, 1.5, C)
    log_scale = np.float32(2.0)

    probs, logits = fused_dac_scores(jnp.asarray(img_f),
                                     jnp.asarray(txt_f),
                                     jnp.asarray(log_scale),
                                     jnp.asarray(conf))

    # composed reference: cosine logits -> host DAC predict -> softmax
    ref_logits = np.asarray(cosine_logits(jnp.asarray(img_f),
                                          jnp.asarray(txt_f),
                                          jnp.asarray(log_scale)))
    dac = DistanceAwareCalibration()
    dac.class_confidence = conf
    ref_logits = dac.predict(ref_logits)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(probs),
                               softmax(ref_logits, axis=-1), rtol=1e-4,
                               atol=1e-6)
