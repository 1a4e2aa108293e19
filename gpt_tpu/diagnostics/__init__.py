from gpt_tpu.diagnostics.mcmc import potential_scale_reduction, effective_sample_size, summarize_chains

__all__ = ["potential_scale_reduction", "effective_sample_size", "summarize_chains"]
