"""CLIP module (vision+text+logit_scale) behavior tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peft_vit_tpu.models import CLIP
from peft_vit_tpu.engine.loss import clip_contrastive_loss


@pytest.fixture(scope="module")
def tiny_clip():
    model = CLIP(
        embed_dim=16,
        image_size=16,
        patch_size=8,
        vision_width=32,
        vision_layers=2,
        vision_heads=2,
        vocab_size=64,
        context_length=8,
        text_width=16,
        text_layers=2,
        text_heads=2,
        use_flash=False,
    )
    img = jnp.zeros((2, 16, 16, 3))
    toks = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img, toks)["params"]
    return model, params


class TestCLIP:
    def test_logit_shapes_and_symmetry(self, tiny_clip):
        model, params = tiny_clip
        img = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 16, 3))
        toks = jnp.asarray(
            np.random.RandomState(0).randint(1, 64, (3, 8))
        )
        li, lt = model.apply({"params": params}, img, toks)
        assert li.shape == (3, 3)
        np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T)

    def test_eot_pooling_uses_highest_token(self, tiny_clip):
        """Text features come from the argmax-token position (CLIP EOT
        convention): changing tokens after EOT must not change features."""
        model, params = tiny_clip
        toks = jnp.asarray([[5, 9, 63, 0, 0, 0, 0, 0]])
        toks2 = jnp.asarray([[5, 9, 63, 7, 0, 0, 0, 0]])
        f1 = model.apply(
            {"params": params}, toks, method=lambda m, t: m.encode_text(t)
        )
        f2 = model.apply(
            {"params": params}, toks2, method=lambda m, t: m.encode_text(t)
        )
        # token 63 is EOT (max id); position 3 changes only AFTER it in
        # causal order -> attention is causal, so the EOT feature at pos 2
        # is unchanged
        np.testing.assert_allclose(
            np.asarray(f1), np.asarray(f2), atol=1e-5
        )

    def test_contrastive_loss_at_uniform(self):
        n = 4
        logits = jnp.zeros((n, n))
        loss = clip_contrastive_loss(logits, logits.T)
        np.testing.assert_allclose(float(loss), np.log(n), atol=1e-5)

    def test_logit_scale_init(self, tiny_clip):
        model, params = tiny_clip
        np.testing.assert_allclose(
            float(params["logit_scale"]), np.log(1 / 0.07), rtol=1e-5
        )
