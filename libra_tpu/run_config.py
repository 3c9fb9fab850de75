"""Run configuration: three-section YAML (model / datasets / run) with
dotlist overrides and eager validation.

Equivalent of the reference config system (libra/common/config.py:17-143):
OmegaConf YAML merged with `--options a.b=c` overrides, split into
.model_cfg / .datasets_cfg / .run_cfg. Implemented on plain PyYAML (no
omegaconf dependency) and validated at load time -- unknown model arches
and dangling paths fail immediately instead of rotting silently
(the reference shipped configs referencing nonexistent arches/paths,
SURVEY.md section 5).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml

from libra_tpu.registry import registry


def _parse_value(v: str) -> Any:
    return yaml.safe_load(v)


def parse_dotlist(options: Optional[List[str]]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for opt in options or []:
        if "=" not in opt:
            raise ValueError(f"override {opt!r} is not key=value")
        key, val = opt.split("=", 1)
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(val)
    return out


def deep_merge(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


class RunConfig:
    def __init__(self, cfg_path: str, options: Optional[List[str]] = None):
        with open(cfg_path) as f:
            cfg = yaml.safe_load(f) or {}
        cfg = deep_merge(cfg, parse_dotlist(options))
        self.config = cfg
        self.model_cfg: Dict[str, Any] = cfg.get("model", {})
        self.datasets_cfg: Dict[str, Any] = cfg.get("datasets", {})
        self.run_cfg: Dict[str, Any] = cfg.get("run", {})
        self.validate()

    def validate(self) -> None:
        arch = self.model_cfg.get("arch")
        if arch is not None:
            registry.get_model_class(arch)  # raises with options listed
        for name in self.datasets_cfg:
            registry.get_builder_class(name)
        pretrained = self.model_cfg.get("pretrained")
        if pretrained is not None and not Path(pretrained).exists():
            raise FileNotFoundError(
                f"model.pretrained path does not exist: {pretrained}")

    def pretty(self) -> str:
        return yaml.safe_dump(self.config, sort_keys=False)
