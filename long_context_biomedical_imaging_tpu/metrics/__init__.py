from .functional import accuracy_top1, auroc, f1_score, psnr, ssim
from .manager import AverageMeter, MetricManager

__all__ = ["MetricManager", "AverageMeter", "accuracy_top1", "auroc", "f1_score",
           "psnr", "ssim"]
