"""Advisory cost analytics (reference parity: Jackson queueing model,
bandwidth model, and the deployment-plan enumerate-and-pick pipeline —
see each module's docstring for file:line citations)."""

from striot_spark.cost import bandwidth, jackson, partition  # noqa: F401
