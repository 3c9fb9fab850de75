"""Conversation prompt templates (LLaVA-style).

Fresh implementation of the template behaviors in the reference
(libra/data/datasets/conversation.py:6-377): a Conversation carries a
system prompt, two roles and a message list, and renders a single prompt
string according to its separator style. Libra's shipped configs use
"v1" (vicuna_v1, TWO style) for instruction tuning and "plain" for
caption pretraining.
"""

from __future__ import annotations

import dataclasses
from enum import Enum, auto
from typing import List, Optional, Tuple


class SeparatorStyle(Enum):
    SINGLE = auto()
    TWO = auto()
    MPT = auto()
    PLAIN = auto()
    LLAMA_2 = auto()


@dataclasses.dataclass
class Conversation:
    system: str
    roles: Tuple[str, str]
    messages: List[List[Optional[str]]]
    offset: int = 0
    sep_style: SeparatorStyle = SeparatorStyle.SINGLE
    sep: str = "###"
    sep2: Optional[str] = None
    version: str = "Unknown"

    def copy(self) -> "Conversation":
        return Conversation(
            system=self.system, roles=self.roles,
            messages=[list(m) for m in self.messages], offset=self.offset,
            sep_style=self.sep_style, sep=self.sep, sep2=self.sep2,
            version=self.version)

    def append_message(self, role: str, message: Optional[str]) -> None:
        self.messages.append([role, message])

    def get_prompt(self) -> str:
        style = self.sep_style
        if style == SeparatorStyle.SINGLE:
            out = self.system + self.sep
            for role, msg in self.messages:
                out += f"{role}: {msg}{self.sep}" if msg else f"{role}:"
            return out
        if style == SeparatorStyle.TWO:
            seps = (self.sep, self.sep2)
            out = self.system + seps[0]
            for i, (role, msg) in enumerate(self.messages):
                out += f"{role}: {msg}{seps[i % 2]}" if msg else f"{role}:"
            return out
        if style == SeparatorStyle.MPT:
            out = self.system + self.sep
            for role, msg in self.messages:
                out += f"{role}{msg}{self.sep}" if msg else role
            return out
        if style == SeparatorStyle.PLAIN:
            seps = (self.sep, self.sep2)
            out = self.system
            for i, (_, msg) in enumerate(self.messages):
                out += f"{msg}{seps[i % 2]}" if msg else ""
            return out
        if style == SeparatorStyle.LLAMA_2:
            out = ""
            for i, (role, msg) in enumerate(self.messages):
                if not msg:
                    continue
                if i == 0:
                    msg = f"<<SYS>>\n{self.system}\n<</SYS>>\n\n{msg}"
                if i % 2 == 0:
                    out += f"{self.sep}[INST] {msg} [/INST]"
                else:
                    out += f" {msg} {self.sep2}"
            return out.lstrip(self.sep)
        raise ValueError(f"Invalid separator style {style}")


conv_vicuna_v1 = Conversation(
    system=("A chat between a curious user and an artificial intelligence "
            "assistant. The assistant gives helpful, detailed, and polite "
            "answers to the user's questions."),
    roles=("USER", "ASSISTANT"),
    messages=[],
    sep_style=SeparatorStyle.TWO,
    sep=" ",
    sep2=" </s>",
    version="v1",
)

conv_plain = Conversation(
    system="",
    roles=("", ""),
    messages=[],
    sep_style=SeparatorStyle.PLAIN,
    sep="\n",
    version="plain",
)

conv_llama_2 = Conversation(
    system=("You are a helpful, respectful and honest assistant."),
    roles=("USER", "ASSISTANT"),
    messages=[],
    sep_style=SeparatorStyle.LLAMA_2,
    sep="<s>",
    sep2="</s>",
    version="llama_2",
)

conv_vicuna_v0 = Conversation(
    system=("A chat between a curious human and an artificial intelligence "
            "assistant. The assistant gives helpful, detailed, and polite "
            "answers to the human's questions."),
    roles=("Human", "Assistant"),
    messages=[],
    sep_style=SeparatorStyle.SINGLE,
    sep="###",
    version="v0",
)

conv_mpt = Conversation(
    system="<|im_start|>system\nA conversation between a user and an LLM-"
           "based AI assistant.<|im_end|>",
    roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
    messages=[],
    sep_style=SeparatorStyle.MPT,
    sep="<|im_end|>",
    version="mpt",
)

conv_templates = {
    "v1": conv_vicuna_v1,
    "vicuna_v1": conv_vicuna_v1,
    "llava_v1": conv_vicuna_v1,
    "default": conv_vicuna_v1,
    "v0": conv_vicuna_v0,
    "llava_v0": conv_vicuna_v0,
    "plain": conv_plain,
    "v0_plain": conv_plain,
    "llama_2": conv_llama_2,
    "llava_llama_2": conv_llama_2,
    "mpt": conv_mpt,
}
