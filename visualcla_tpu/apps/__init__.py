"""Front-ends: CLI REPL (inference), Gradio demo, batch evaluator, HTTP server."""
