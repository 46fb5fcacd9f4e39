"""Loader mixins (import-only: the reference never exercises hub loading in
the oracle tests)."""


class UNet2DConditionLoadersMixin:
    pass


class FromOriginalControlnetMixin:
    pass
