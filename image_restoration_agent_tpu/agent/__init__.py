from .graph import StateGraph, END
from .executor import Tool, Executor, build_default_executor
from .iragent import IRAgent
from .graph_app import create_image_analysis_graph, run_agent

__all__ = [
    "StateGraph", "END",
    "Tool", "Executor", "build_default_executor",
    "IRAgent",
    "create_image_analysis_graph", "run_agent",
]
