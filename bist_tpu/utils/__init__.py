from bist_tpu.utils.profiling import StepTimer, trace_context, profile_to
