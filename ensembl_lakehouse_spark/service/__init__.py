"""Service-layer components: caching, job registry, export state.

These replace the reference's Redis + Celery plumbing
(app/redis_setup.py, app/tasks.py) with in-process equivalents
behind pluggable interfaces.
"""
