"""Gaussian-trajectory forecasting (SURVEY.md components 16-17)."""
from .model import TrajectoryForecaster  # noqa: F401
from .train import (make_windows, train_forecaster, evaluate_forecaster,
                    forecast)  # noqa: F401
