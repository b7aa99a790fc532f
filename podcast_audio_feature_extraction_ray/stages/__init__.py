"""Ray Data stages: composable Dataset -> Dataset operators."""
