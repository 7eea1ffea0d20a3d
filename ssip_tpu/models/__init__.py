"""Model zoo: TPU-native (Flax/NHWC) ResNet + ViT families with torch porting."""

from ssip_tpu.models.resnet import (  # noqa: F401
    MODEL_FACTORIES as _RESNET_FACTORIES,
    ResNet,
    ResNet18,
    ResNet34,
    ResNet50,
    resnet18,
)
from ssip_tpu.models.vit import (  # noqa: F401
    VIT_FACTORIES,
    VisionTransformer,
)
from ssip_tpu.models.moe import (  # noqa: F401
    MOE_FACTORIES,
    MoEVisionTransformer,
)

# single arch registry: every --arch value maps to a
# factory(num_classes=None, compute_dtype=f32) -> Flax module with the
# shared __call__(x, train=, return_features=, mask=) signature
MODEL_FACTORIES = {**_RESNET_FACTORIES, **VIT_FACTORIES, **MOE_FACTORIES}
