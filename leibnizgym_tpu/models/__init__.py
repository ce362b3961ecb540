"""Model tables (robot/object constants) and neural network definitions."""
