"""End-to-end smoke with REAL libra-11b weights (VERDICT r1 item 10).

Gated: runs only when LIBRA_CKPT points at a reference checkpoint dir
(README.md:53-83 layout: config.json + weights + vqgan.ckpt +
vision_tokenizer_config.yaml + CLIP dir + LLaMA tokenizer). The sandbox has
no network egress, so CI always skips; on a machine with the checkpoint:

    LIBRA_CKPT=/ckpts/libra-11b-base python -m pytest tests/test_real_weights.py -s
"""

import os
import time

import numpy as np
import pytest

CKPT = os.environ.get("LIBRA_CKPT")

pytestmark = pytest.mark.skipif(
    not CKPT, reason="set LIBRA_CKPT=/path/to/libra-11b-base to run")


@pytest.fixture(scope="module")
def pipe():
    from libra_tpu.pipeline import LibraPipeline
    quant = os.environ.get("LIBRA_QUANTIZE", "1") == "1"
    return LibraPipeline.from_pretrained(CKPT, quantize=quant)


def test_caption_nondegenerate(pipe):
    """Greedy caption of a synthetic image: output must be real text --
    non-empty, not a single repeated token, contains letters."""
    from PIL import Image
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (336, 336, 3), np.uint8))

    t0 = time.perf_counter()
    out = pipe.chat(["Describe this image briefly."], images=[img],
                    max_new_tokens=32)
    dt = time.perf_counter() - t0
    text = out[0]
    assert isinstance(text, str) and len(text.strip()) > 0
    words = text.split()
    assert len(set(words)) > 1, f"degenerate output: {text!r}"
    assert any(c.isalpha() for c in text)
    print(f"\n[real-weights] caption: {text!r}  ({32/dt:.1f} tok/s incl. "
          "tokenize)")


def test_greedy_agrees_with_reference_one_prompt(pipe):
    """Greedy-token agreement vs the actual reference model on one prompt
    (needs the reference repo + enough host RAM for the torch 11B)."""
    import importlib.util
    if importlib.util.find_spec("libra") is None and \
            not os.path.exists("/root/reference/libra"):
        pytest.skip("reference repo unavailable")
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from libra.models.libra.modeling_libra import LibraForCausalLM
        from libra.models.libra.tokenization_libra import LibraTokenizer
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference import failed: {e!r}")

    from libra_tpu.pipeline import process_prompt
    prompt = process_prompt("What animal is this?")
    from PIL import Image
    rng = np.random.RandomState(1)
    img = Image.fromarray(rng.randint(0, 255, (336, 336, 3), np.uint8))

    with torch.no_grad():
        ref_model = LibraForCausalLM.from_pretrained(
            CKPT, torch_dtype=torch.float32)
        ref_tok = LibraTokenizer(CKPT)
        ref_tok.text_tokenizer.padding_side = "left"
        inputs = ref_tok([{"language": [prompt], "vision": [img]}])
        ref_out = ref_model.generate(
            **{k: v for k, v in inputs.items()}, max_new_tokens=8,
            do_sample=False, use_cache=True)
        ref_new = np.asarray(ref_out)[:, 0, inputs["input_ids"].shape[-1]:]

    from libra_tpu.generation import GenerationConfig
    jinputs = pipe._tokenize([prompt], [img])
    jres = pipe.generator(jinputs, GenerationConfig(
        max_new_tokens=8,
        eos_token_id=pipe.tokenizer.text_tokenizer.eos_token_id,
        pad_token_id=pipe.tokenizer.text_tokenizer.pad_token_id))
    N = np.asarray(jinputs["input_ids"]).shape[-1]
    ours = np.asarray(jres.sequences)[0, 0, N:]
    np.testing.assert_array_equal(ours, ref_new[0])
