from .ce_loss import CELossConfig, ce_loss, build_loss_weights

__all__ = ["CELossConfig", "ce_loss", "build_loss_weights"]
