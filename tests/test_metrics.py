"""Caption/VQA scorers: hand-computed BLEU values, CIDEr-D ordering
properties, VQA accuracy thirds."""

import math

import numpy as np

from libra_tpu.metrics import (bleu4, cider_d, score_captions, tokenize,
                               vqa_accuracy)


def test_tokenize_strips_punct_lowercases():
    assert tokenize("A cat, on the MAT!") == ["a", "cat", "on", "the", "mat"]


def test_bleu4_perfect_match_is_one():
    c = {"1": "a cat sits on the mat today"}
    r = {"1": ["a cat sits on the mat today"]}
    assert abs(bleu4(c, r) - 1.0) < 1e-9


def test_bleu4_hand_computed():
    # candidate: "the cat the cat on mat" (6 tokens)
    # reference: "the cat is on the mat" (6)
    # 1-grams: counts c: the:2 cat:2 on:1 mat:1; clipped vs ref(the:2,cat:1,
    # on:1, mat:1): the:2 cat:1 on:1 mat:1 = 5/6
    # 2-grams c: (the,cat)x2,(cat,the),(cat,on),(on,mat); ref has (the,cat),
    # (on,the),(the,mat),(cat,is),(is,on): clipped: (the,cat):1 -> 1/5
    # 3-grams: c {(the,cat,the),(cat,the,cat),(cat,on,mat),(the,cat,on)};
    # ref 3-grams none match -> 0 => BLEU-4 = 0
    c = {"1": "the cat the cat on mat"}
    r = {"1": ["the cat is on the mat"]}
    assert bleu4(c, r) == 0.0


def test_bleu4_brevity_penalty():
    # identical 5-token prefix of a 10-token reference: precisions 1 but
    # BP = exp(1 - 10/5) = e^-1
    c = {"1": "a b c d e"}
    r = {"1": ["a b c d e f g h i j"]}
    got = bleu4(c, r)
    assert abs(got - math.exp(1 - 10 / 5)) < 1e-9


def test_cider_d_orders_quality():
    refs = {
        "1": ["a dog runs across the green field",
              "the dog is running on grass"],
        "2": ["two people ride bicycles down the street",
              "cyclists on a city road"],
    }
    perfect = {"1": "a dog runs across the green field",
               "2": "two people ride bicycles down the street"}
    partial = {"1": "a dog runs", "2": "people on the street"}
    wrong = {"1": "quantum entanglement excels", "2": "seventeen furious pianos"}
    s_perfect = cider_d(perfect, refs)
    s_partial = cider_d(partial, refs)
    s_wrong = cider_d(wrong, refs)
    assert s_perfect > s_partial > s_wrong
    assert s_wrong == 0.0
    assert s_perfect <= 10.0 + 1e-9


def test_cider_d_length_penalty():
    refs = {"1": ["a cat on a mat"], "2": ["dogs play in the park"]}
    exact = {"1": "a cat on a mat", "2": "dogs play in the park"}
    padded = {"1": "a cat on a mat " + "word " * 12,
              "2": "dogs play in the park"}
    assert cider_d(exact, refs) > cider_d(padded, refs)


def test_vqa_accuracy_thirds():
    answers = {"q1": ["blue"] * 3 + ["green"] * 7,
               "q2": ["two"] * 1 + ["three"] * 9,
               "q3": ["yes"] * 10}
    # blue appears 3x -> min(1, 3/3) = 1
    assert vqa_accuracy({"q1": "Blue!"}, answers) == 1.0
    # two appears once -> 1/3
    assert abs(vqa_accuracy({"q2": "two"}, answers) - 1 / 3) < 1e-9
    # article stripping
    assert vqa_accuracy({"q3": "the yes"}, answers) == 1.0
    # averaged over questions
    got = vqa_accuracy({"q1": "blue", "q2": "seven"}, answers)
    assert abs(got - 0.5) < 1e-9


def test_score_captions_karpathy_rows():
    anns = [{"image_id": 7, "caption": "a cat on a mat"},
            {"image_id": 7, "caption": "cat resting on the mat"},
            {"image_id": 9, "caption": "a red car"}]
    preds = [{"image_id": 7, "caption": "a cat on a mat"},
             {"image_id": 9, "caption": "a red car"}]
    out = score_captions(preds, anns)
    assert out["scored"] == 2
    assert out["cider_d"] > 5.0
    assert out["bleu4"] > 0.0
