"""Identity encoder/decoder for ablations (ref: model/models/identity.py:9-26)."""

from __future__ import annotations

import flax.linen as nn


class IdentityEncoder(nn.Module):
    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return [x]


class IdentityDecoder(nn.Module):
    @nn.compact
    def __call__(self, hidden_states, deterministic: bool = True):
        return hidden_states[-1]
