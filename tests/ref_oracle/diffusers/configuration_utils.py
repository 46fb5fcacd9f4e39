"""ConfigMixin / register_to_config with diffusers' load-bearing semantics:

1. the decorator records every __init__ argument (defaults applied) into
   ``self._internal_dict`` BEFORE running the init body, and
2. ConfigMixin.__getattr__ falls back to the config dict, so init bodies may
   read ``self.<config_key>`` before assigning it (the vendored scheduler
   does exactly this with ``self.use_karras_sigmas``).
"""

import functools
import inspect


class FrozenDict(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)


class ConfigMixin:
    @property
    def config(self):
        return self._internal_dict

    def __getattr__(self, name):
        d = self.__dict__.get("_internal_dict")
        if d is not None and name in d:
            return d[name]
        raise AttributeError(f"{type(self).__name__!r} object has no attribute {name!r}")

    def register_to_config(self, **kwargs):
        current = self.__dict__.get("_internal_dict") or FrozenDict()
        merged = dict(current)
        merged.update(kwargs)
        self._internal_dict = FrozenDict(merged)

    @classmethod
    def from_config(cls, config: dict, **overrides):
        """Instantiate from a config.json dict, dropping unknown keys —
        diffusers' from_config semantics (used by the parity gate to mirror
        from_pretrained without hub machinery)."""
        sig = inspect.signature(cls.__init__)
        accepted = {
            k: v for k, v in {**config, **overrides}.items() if k in sig.parameters
        }
        return cls(**accepted)


def register_to_config(init):
    @functools.wraps(init)
    def wrapper(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        self.register_to_config(**cfg)
        init(self, *args, **kwargs)

    return wrapper
