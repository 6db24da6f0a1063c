from .alexnet import ALEXNET_DAU_VARIANTS, AlexNetDAU
from .cifar import ConvCifarNet, DAUCifarNet
from .resnet import RESNET_DAU_DEPTHS, DAUResNet

__all__ = ["AlexNetDAU", "ALEXNET_DAU_VARIANTS", "ConvCifarNet",
           "DAUCifarNet", "DAUResNet", "RESNET_DAU_DEPTHS"]
