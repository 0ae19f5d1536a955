"""Output heads composing a backbone into a trainable model.

Mirrors the model assembly in the reference trainer
(``/root/reference/learn_image_embeddings.py:125-148``): an optional output
transform (L2 normalization for the cosine loss, softmax for softmax_corr)
and an optional classification head (relu -> BN -> Dense softmax ``prob``,
``learn_image_embeddings.py:16-45``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.cosine_loss import l2_normalize as l2norm  # noqa: F401 - canonical
from .layers import KerasBatchNorm, dense, upcast32


class EmbeddingModel(nn.Module):
    """Backbone + output transform + optional softmax classification head.

    Returns the transformed embedding, or ``(embedding, prob)`` when a
    classification head is attached (``cls_classes > 0``).  The head consumes
    the *transformed* output (the reference attaches it after the l2norm /
    softmax layer, ``learn_image_embeddings.py:127-132`` + ``:16-45``);
    ``cls_input='l2norm'`` reproduces that when ``output='linear'`` is used
    so the fused Pallas cosine loss can consume raw embeddings.

    ``cls_base`` attaches the head to the output of a *named* backbone
    module instead (the reference's ``cls_model(…, cls_base)`` tapping
    ``get_layer(name).output``, ``learn_image_embeddings.py:34-40``).  The
    tap is captured functionally during the backbone call via
    ``nn.intercept_methods`` — no graph surgery; gradients flow through the
    tapped activation as part of the same traced apply.  Accepts a full
    module path (``stage2_block3/conv_a``) or a unique trailing name.
    """

    backbone: nn.Module
    output: str = "linear"  # 'linear' | 'l2norm' | 'softmax'
    cls_classes: int = 0
    cls_input: str = "output"  # 'output' | 'l2norm'
    cls_base: str | None = None
    dtype: Any = None

    def _call_backbone_tapped(self, x, train):
        """Runs the backbone capturing the named module's output."""
        taps: dict[str, Any] = {}
        want = self.cls_base

        def interceptor(next_fun, args, kwargs, context):
            out = next_fun(*args, **kwargs)
            mod = context.module
            try:
                path = "/".join(str(p) for p in mod.path)
            except Exception:
                path = mod.name or ""
            if path == want or path.endswith("/" + want) or mod.name == want:
                taps[path] = out
            return out

        with nn.intercept_methods(interceptor):
            emb = self.backbone(x, train=train)
        if len(taps) == 0:
            raise ValueError(
                f"cls_base={want!r} matched no module in the backbone"
            )
        if len(taps) > 1:
            raise ValueError(
                f"cls_base={want!r} is ambiguous; candidates: "
                f"{sorted(taps)} — use a full module path"
            )
        return emb, next(iter(taps.values()))

    @nn.compact
    def __call__(self, x, train: bool = False):
        tapped = None
        if self.cls_classes > 0 and self.cls_base is not None:
            emb, tapped = self._call_backbone_tapped(x, train)
        else:
            emb = self.backbone(x, train=train)
        if self.output == "l2norm":
            emb = l2norm(upcast32(emb))
            self.sow("intermediates", "l2norm", emb)
        elif self.output == "softmax":
            emb = nn.softmax(upcast32(emb))
            self.sow("intermediates", "softmax", emb)

        if self.cls_classes > 0:
            if tapped is not None:
                if tapped.ndim != 2:
                    raise ValueError(
                        f"cls_base={self.cls_base!r} output has shape "
                        f"{tapped.shape}; the classification head needs a "
                        "flat (batch, features) tap — name a Dense/pooled "
                        "module such as 'top' (a Dense over a 4-D feature "
                        "map would produce per-position logits, which is "
                        "also what the reference's Keras head would do)."
                    )
                head_in = tapped
            elif self.cls_input == "l2norm":
                head_in = l2norm(upcast32(emb))
            else:
                head_in = emb
            y = nn.relu(head_in)
            y = KerasBatchNorm(dtype=self.dtype, name="cls_bn")(y, train)
            y = dense(self.cls_classes, name="cls_top", dtype=self.dtype)(y)
            prob = nn.softmax(upcast32(y))
            self.sow("intermediates", "prob", prob)
            return emb, prob
        return emb
