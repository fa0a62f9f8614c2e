from .optim import OneCycleSchedule, build_optimizer, one_cycle_lr, one_cycle_momentum
