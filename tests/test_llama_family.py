"""Text-only LLaMA family: logit parity against HF transformers'
LlamaForCausalLM via the weight converter, plus logits processors and
the llm_lr_scale optimizer groups."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libra_tpu.config import LibraConfig
from libra_tpu.logits_processors import no_newline_processor, valid_image_processor
from libra_tpu.models import llama as L
from libra_tpu.models import libra as M
from libra_tpu.training.optimizer import OptimizerConfig, make_optimizer


def test_llama_parity_vs_hf():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=64,
        rope_theta=10000.0, attn_implementation="eager")
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    if "lm_head.weight" not in sd:  # tied embeddings
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]

    cfg = LibraConfig.tiny(vocab_size=128, hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4,
                           max_position_embeddings=64)
    params = L.convert_hf_llama_state_dict(sd, cfg)

    ids = np.random.RandomState(0).randint(0, 128, (2, 9))
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(jax.jit(
        lambda p, i: L.forward(p, cfg, i))(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_no_newline_processor():
    cfg = LibraConfig.tiny()
    Q, B, Vc = 2, 3, cfg.combined_vocab_size
    logits = jnp.ones((Q, B, Vc))
    emitted = jnp.array([True, False, True])
    out = no_newline_processor(cfg, logits, emitted)
    assert int(jnp.argmax(out[0, 0])) == cfg.eos_token_id
    np.testing.assert_array_equal(out[:, 1], logits[:, 1])


def test_valid_image_processor():
    cfg = LibraConfig.tiny()
    Q, B, Vc = 2, 3, cfg.combined_vocab_size
    Mv = cfg.max_vision_token_length
    logits = jnp.zeros((Q, B, Vc))
    vi = jnp.array([1, Mv - 3, Mv])      # mid-image, last-cell, text
    out = np.asarray(valid_image_processor(cfg, logits, vi))
    # mid-image: only code range alive
    assert (out[0, 0, :cfg.vocab_size] < -1e20).all()
    code_slice = out[0, 0, cfg.vocab_size:cfg.vocab_size
                     + cfg.vision_vocab_size - 2]
    assert (code_slice == 0).all()
    # last cell: forced EOI
    eoi = cfg.vocab_size + cfg.vision_vocab_size - 1
    assert np.argmax(out[0, 1]) == eoi
    # text: untouched
    np.testing.assert_array_equal(out[:, 2], 0)


def test_llm_lr_scale_groups():
    cfg = LibraConfig.tiny()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(OptimizerConfig(learning_rate=1e-2, total_steps=10,
                                         warmup_ratio=0.0, llm_lr_scale=0.0),
                         params)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    # two updates (first has lr=0 from warmup-free cosine start? no:
    # warmup_ratio=0 -> warmup_steps=1, step0 lr=0) -- use step 1
    updates, state = opt.update(grads, state, params)
    updates, state = opt.update(grads, state, params)
    # language params get zero LR, vision params move
    assert float(jnp.abs(updates["lm_head"]).max()) == 0.0
    assert float(jnp.abs(updates["vision_lm_head"]).max()) > 0.0


def test_llama_sequence_classification_vs_hf():
    """Pooled-at-last-token classification parity with HF
    LlamaForSequenceClassification (vendored in the reference)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=64,
        rope_theta=10000.0, num_labels=5, pad_token_id=0,
        attn_implementation="eager")
    torch.manual_seed(1)
    model = transformers.LlamaForSequenceClassification(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    sd["lm_head.weight"] = np.zeros((128, 32), np.float32)  # unused head

    cfg = LibraConfig.tiny(vocab_size=128, hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4,
                           max_position_embeddings=64)
    params = L.convert_hf_llama_state_dict(sd, cfg)
    params["score"] = jnp.asarray(sd["score.weight"].T)

    rng = np.random.RandomState(0)
    ids = rng.randint(1, 128, (3, 9))
    ids[0, 6:] = 0                      # right padding (pad_token_id=0)
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(ids),
                     attention_mask=torch.from_numpy(mask)).logits.numpy()
    got = np.asarray(jax.jit(
        lambda p, i, m: L.sequence_classification_logits(p, cfg, i, m))(
            params, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
