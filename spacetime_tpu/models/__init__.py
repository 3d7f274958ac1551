"""Body models: softbodies (spring-mass blobs) and aloofbodies (rigid
relativistic bodies)."""

from . import softbody
