"""Model zoo: TPU-native (Flax/NHWC) ResNet family with torch weight porting."""

from ssip_tpu.models.resnet import ResNet, ResNet18, resnet18  # noqa: F401
