from .metrics import RenderMetrics, Timer, log_step
