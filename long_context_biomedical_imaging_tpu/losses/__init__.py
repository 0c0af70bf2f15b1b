from .loss_base import get_loss_func
from .enhancement_losses import (charbonnier_loss, combined_enhance_loss,
                                 gaussian_deriv3d_loss, mse_loss)
from .loss_base import cross_entropy_loss

__all__ = ["get_loss_func", "cross_entropy_loss", "mse_loss", "charbonnier_loss",
           "gaussian_deriv3d_loss", "combined_enhance_loss"]
