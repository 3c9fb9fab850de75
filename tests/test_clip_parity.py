"""CLIP encoder parity against the real HuggingFace CLIPVisionModel
(the reference vendors stock HF CLIP -- SURVEY.md C2), via the checkpoint
converter, at the exact feature tap Libra uses (hidden_states[-2], CLS
dropped, square reshape)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from libra_tpu.checkpoint import convert_clip_state_dict
from libra_tpu.config import CLIPVisionConfig
from libra_tpu.models import clip as clip_model


@pytest.fixture(scope="module")
def hf_pair():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="quick_gelu")
    torch.manual_seed(0)
    model = transformers.CLIPVisionModel(hf_cfg).eval()
    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=4,
                           image_size=28, patch_size=14)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_clip_state_dict(sd, cfg)
    return model, cfg, params


def test_feature_tap_parity(hf_pair):
    model, cfg, params = hf_pair
    rng = np.random.RandomState(0)
    x = rng.randn(2, 28, 28, 3).astype(np.float32)

    with torch.no_grad():
        out = model(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    output_hidden_states=True)
    want = out.hidden_states[-2][:, 1:].numpy()          # drop CLS
    B, N, C = want.shape
    g = int(N ** 0.5)
    want = want.reshape(B, g, g, C)

    got = clip_model.forward_features(params, cfg, jnp.asarray(x),
                                      select_layer=-2, square_output=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_last_hidden_parity(hf_pair):
    """Also check a different tap (-1 == run all layers)."""
    model, cfg, params = hf_pair
    rng = np.random.RandomState(1)
    x = rng.randn(1, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    output_hidden_states=True)
    want = out.hidden_states[-1][:, 1:].numpy()
    got = clip_model.forward_features(params, cfg, jnp.asarray(x),
                                      select_layer=-1, square_output=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_image_preprocess_parity_vs_hf():
    """Preprocessing parity with HF CLIPImageProcessor (the reference
    vendors it verbatim; image_processing_clip.py:219-337): resize
    shortest-edge bicubic -> center-crop -> rescale -> normalize."""
    transformers = pytest.importorskip("transformers")
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from libra_tpu.data.processors import LibraImageProcessor

    hf = transformers.CLIPImageProcessor(
        size={"shortest_edge": 336}, crop_size={"height": 336, "width": 336},
        do_resize=True, do_center_crop=True, do_rescale=True,
        do_normalize=True, do_convert_rgb=True)
    ours = LibraImageProcessor()

    rng = np.random.RandomState(0)
    for shape in ((400, 640), (640, 400), (336, 336), (250, 700)):
        img = Image.fromarray(rng.randint(0, 255, shape + (3,), np.uint8))
        want = hf(images=img, return_tensors="np")["pixel_values"][0]
        got = np.asarray(ours(img))                     # (H, W, C)
        np.testing.assert_allclose(got.transpose(2, 0, 1), want,
                                   rtol=1e-5, atol=1e-5)
