from banggameengine_tpu.physics.config import PhysicsConfig, load_physics_config

__all__ = ["PhysicsConfig", "load_physics_config"]
