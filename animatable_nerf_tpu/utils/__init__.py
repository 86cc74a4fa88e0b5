from .profiling import profile_trace, ThroughputMeter, StepTimer
