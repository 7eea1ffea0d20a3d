"""Model zoo: TPU-native (Flax/NHWC) ResNet family with torch weight porting."""

from ssip_tpu.models.resnet import (  # noqa: F401
    MODEL_FACTORIES,
    ResNet,
    ResNet18,
    ResNet34,
    ResNet50,
    resnet18,
)
