from de4ml_spark.streaming.delayed_join import (
    delayed_emission_join,
    last_reward_per_decision,
    override_anti_join,
)

__all__ = [
    "delayed_emission_join",
    "last_reward_per_decision",
    "override_anti_join",
]
