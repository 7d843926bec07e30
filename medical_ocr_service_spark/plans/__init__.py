"""Pipeline assemblies: flagship pre-visacion plan, checkpoint/resume, driver queries."""
