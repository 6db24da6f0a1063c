from .alexnet import ALEXNET_DAU_VARIANTS, AlexNetDAU
from .cifar import DAUCifarNet

__all__ = ["AlexNetDAU", "ALEXNET_DAU_VARIANTS", "DAUCifarNet"]
