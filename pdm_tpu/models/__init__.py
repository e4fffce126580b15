from .base import DDPM as DDPM, TrueDDPM as TrueDDPM
from .from_config import ddpm_from_config as ddpm_from_config
from .lenet import LeNet as LeNet, train_lenet as train_lenet
from .predictions import (
    Predictions as Predictions,
    convert_prediction as convert_prediction,
    training_target as training_target,
)
from .unet import UNet2D as UNet2D, unet_from_config as unet_from_config
from .unet_ddpm import UNetDDPM as UNetDDPM, init_unet_ddpm as init_unet_ddpm
