SELECT * FROM (VALUES
(CAST('bear' AS VARCHAR),CAST('Being_born' AS VARCHAR),CAST(127 AS BIGINT)),
('study','Education',202),
('receive','Award',232),
('join','Work',125),
('die','Death',234),
('live','Residence',126),
('work','Occupation',96),
('marry','Marriage',116),
('raise','Parenting',112)
) AS t("lu","frame","n")