"""Flax CNN model zoo + the architecture factory.

``build_network`` mirrors the reference factory
(``/root/reference/utils.py:130-276``) including the per-architecture L2
regularization scheme, returned as declarative filters so the trainer can add
the exact penalty to the loss (Keras attaches it per-layer; in JAX the loss
owns it).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import flax.linen as nn

from .cifar_resnet import SmallResNet
from .densenet import DenseNet
from .heads import EmbeddingModel, l2norm
from .plainnet import PlainNet
from .pyramidnet import PyramidNet
from .resnet import ResNet
from .wrn import WideResNet

ARCHITECTURES = [
    "simple",
    "resnet-32",
    "resnet-110",
    "resnet-110-fc",
    "resnet-110-wfc",
    "wrn-28-10",
    "densenet-100-12",
    "densenet-100-24",
    "densenet-bc-190-40",
    "pyramidnet-272-200",
    "pyramidnet-110-270",
    "resnet-50",
    "resnet-101",
    "resnet-152",
    "rn18",
    "rn34",
    "rn50",
    "rn101",
    "rn152",
    "rn200",
    "nasnet-a",
]


@dataclass
class ModelSpec:
    """A constructed backbone plus its training metadata."""

    architecture: str
    module: nn.Module
    #: list of (path-regex, coefficient): L2 penalty ``coef * sum(kernel**2)``
    #: added to the loss for every 'kernel' param whose path matches.
    l2_filters: list = field(default_factory=list)
    #: nominal input resolution (informational; modules are shape-agnostic)
    input_size: int = 32

    def l2_penalty(self, params):
        """Computes the Keras-style kernel regularization penalty."""
        import jax
        import jax.numpy as jnp

        if not self.l2_filters:
            return 0.0
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        total = 0.0
        for path, leaf in flat:
            names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
            if names[-1] != "kernel":
                continue
            # Match against the module path (leaf name stripped) so patterns
            # anchored with ``$`` work regardless of tree nesting depth.
            joined = "/".join(str(n) for n in names[:-1])
            for pattern, coef in self.l2_filters:
                if re.search(pattern, joined):
                    total = total + coef * jnp.sum(jnp.square(leaf))
                    break
        return total


def _top_activation(classification, no_softmax):
    return "softmax" if classification and not no_softmax else None


def build_network(
    num_outputs,
    architecture,
    classification=False,
    no_softmax=False,
    input_channels=None,
    name=None,
    dtype=None,
    remat=False,
):
    """Constructs a CNN backbone by architecture name.

    Same surface as ``/root/reference/utils.py:130``; returns a
    :class:`ModelSpec` instead of a Keras model.  ``input_channels`` and
    ``name`` are accepted for interface parity (Flax modules are input-shape
    agnostic).
    """
    del input_channels, name  # shape-agnostic; kept for interface parity

    if architecture.lower().endswith("-selu"):
        activation = "selu"
        architecture = architecture[:-5]
    else:
        activation = "relu"

    top = _top_activation(classification, no_softmax)

    if architecture == "simple":
        module = PlainNet(
            output_dim=num_outputs,
            activation=activation,
            final_activation=top,
            dtype=dtype,
        )
        # plainnet: l2(5e-4) on all conv/fc kernels except the final layer
        # (/root/reference/models/plainnet.py:52-71 vs :76).
        return ModelSpec(architecture, module, [(r"^(?!.*top$)", 5e-4)], 32)

    if architecture in ("resnet-32", "resnet-110", "resnet-110-fc", "resnet-110-wfc"):
        n = 5 if architecture == "resnet-32" else 18
        filters = (32, 64, 128) if architecture == "resnet-110-wfc" else (16, 32, 64)
        if architecture in ("resnet-32", "resnet-110"):
            include_top = classification
            top_act = None if no_softmax else "softmax"
        else:
            include_top = True
            top_act = top
        module = SmallResNet(
            n=n,
            filters=filters,
            classes=num_outputs,
            include_top=include_top,
            top_activation=top_act,
            activation=activation,
            remat=remat,
            dtype=dtype,
        )
        # l2(2e-4) on every kernel incl. the top dense
        # (/root/reference/models/cifar_resnet.py:152,218-233).
        return ModelSpec(architecture, module, [(r".*", 2e-4)], 32)

    if architecture == "wrn-28-10":
        module = WideResNet(
            classes=num_outputs, n_blocks=4, width=10, final_activation=top,
            dtype=dtype,
        )
        return ModelSpec(architecture, module, [], 32)  # no regularizer in ref

    if architecture.startswith("densenet"):
        cfg = {
            "densenet-100-12": dict(depth=100, growth_rate=12, bottleneck=False,
                                    nb_filter=16, reduction=0.0),
            "densenet-100-24": dict(depth=100, growth_rate=24, bottleneck=False,
                                    nb_filter=16, reduction=0.0),
            "densenet-bc-190-40": dict(depth=190, growth_rate=40, bottleneck=True,
                                       nb_filter=-1, reduction=0.5),
        }[architecture]
        module = DenseNet(
            classes=num_outputs, nb_dense_block=3, top_activation=top, dtype=dtype,
            **cfg,
        )
        # l2(1e-4) on init/bottleneck/transition convs but NOT the 3x3 growth
        # convs or the top dense (/root/reference/models/DenseNet/densenet.py:
        # 468-475,530).
        return ModelSpec(
            architecture, module,
            [(r"conv_init|_neck$|_trans$", 1e-4)], 32,
        )

    if architecture.startswith("pyramidnet"):
        depth, alpha = {
            "pyramidnet-272-200": (272, 200),
            "pyramidnet-110-270": (110, 270),
        }[architecture]
        module = PyramidNet(
            depth=depth,
            alpha=alpha,
            bottleneck=depth == 272,
            classes=num_outputs,
            top_activation=top,
            activation=activation,
            dtype=dtype,
        )
        return ModelSpec(architecture, module, [(r".*", 2e-4)], 32)

    if architecture in ("resnet-50", "resnet-101", "resnet-152"):
        depth = int(architecture.split("-")[1])
        # BN epsilon per reference builder: resnet-50 is the legacy
        # keras.applications.ResNet50 (Keras-default eps 1e-3,
        # /root/reference/utils.py:235-237); 101/152 come from
        # keras_applications.resnet (resnet_common, eps 1.001e-5,
        # utils.py:230-233).
        module = ResNet(
            depth=depth, classes=num_outputs, include_top=True,
            top_activation=top, remat=remat,
            bn_epsilon=1e-3 if depth == 50 else 1.001e-5, dtype=dtype,
        )
        return ModelSpec(architecture, module, [], 224)  # no regularizer in ref

    if re.fullmatch(r"rn(18|34|50|101|152|200)", architecture):
        depth = int(architecture[2:])
        # Note: for embedding use the reference would apply a softmax to the
        # 'embedding' dense (apparent quirk at /root/reference/utils.py:262);
        # we emit a linear embedding head instead, matching the documented
        # behavior of the resnet-50 path.
        module = ResNet(
            depth=depth, classes=num_outputs, include_top=True,
            top_activation=top, remat=remat, dtype=dtype,
        )
        return ModelSpec(architecture, module, [], 224)

    if architecture == "nasnet-a":
        from .nasnet import NASNetA

        module = NASNetA(
            classes=num_outputs, include_top=True, top_activation=top,
            dtype=dtype,
        )
        return ModelSpec(architecture, module, [], 224)  # no regularizer in ref

    raise ValueError(f"Unknown network architecture: {architecture}")


def get_custom_objects(architecture):
    """Interface-parity stub for ``/root/reference/utils.py:279-285``.

    Keras needed a custom-layer registry (``ChannelPadding``) to deserialize
    saved models; Flax checkpoints are plain parameter trees rebuilt from
    the architecture name, so there is nothing to register.
    """
    del architecture
    return {}


__all__ = [
    "ARCHITECTURES",
    "ModelSpec",
    "build_network",
    "get_custom_objects",
    "EmbeddingModel",
    "l2norm",
    "PlainNet",
    "SmallResNet",
    "WideResNet",
    "PyramidNet",
    "DenseNet",
    "ResNet",
]
