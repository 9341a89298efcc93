SELECT * FROM (VALUES
(CAST(490 AS BIGINT),CAST(0 AS BIGINT))
) AS t("n_docs_checked","n_violations")