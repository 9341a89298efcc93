SELECT * FROM (VALUES
(CAST('Education' AS VARCHAR),CAST('missing_core_fe' AS VARCHAR),CAST(113 AS BIGINT)),
('Work','no_subject',850),
('Award','no_subject',84),
('Death','bad_date',105)
) AS t("frame","reason","n")