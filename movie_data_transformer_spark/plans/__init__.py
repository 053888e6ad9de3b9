from movie_data_transformer_spark.plans.audit import audit_plan, plan_text

__all__ = ["audit_plan", "plan_text"]
