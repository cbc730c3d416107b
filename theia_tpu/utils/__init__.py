from theia_tpu.utils.seed import seed_everything
from theia_tpu.utils.logging import AverageMeter, MetricLogger, create_meters

__all__ = ["seed_everything", "AverageMeter", "MetricLogger", "create_meters"]
